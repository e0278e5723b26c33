"""Distributed tier (SURVEY.md §4): REAL multi-process run — 2 jax.distributed
CPU processes, per-host batch shards, GSPMD gradient all-reduce over the
process mesh, cross-host checksum guard, identical loss on every host.
MEL-CONDITIONED (BASELINE config 5 is multi-host mel training): the mel
stream shards over `data` with the rest of the batch."""
import os
import subprocess
import sys
import time

import numpy as np

WORKER = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@",
    num_processes=2,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig, TrainConfig
from lb_wavenet_tpu.data import make_batches, synthetic_corpus
from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from lb_wavenet_tpu.train import init_state, train_step
from lb_wavenet_tpu.utils.multihost import assert_replicated_params

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32",
                  n_mels=8, cond_channels=8, upsample_factors=(2, 4))
train = TrainConfig(batch_size=4, window_size=32, learning_rate=1e-3, seed=0)
assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh(2, 1)  # one device per process (distributed cpu: 1 local dev? -> all)
corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)
state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
batches = make_batches(corpus, train, host_id=jax.process_index(),
                       host_count=jax.process_count(), with_mel=True)
losses = []
for _ in range(3):
    batch_np = next(batches)
    batch = shard_batch({"inputs": batch_np.inputs, "targets": batch_np.targets,
                         "mask": batch_np.mask, "mel": batch_np.mel}, mesh)
    state, loss = train_step(state, batch, arch, train)
    losses.append(float(loss))
assert_replicated_params(state.params, 3)   # exercises process_allgather
print("LOSSES", json.dumps(losses), flush=True)
"""


def test_two_process_data_parallel_training(tmp_path):
    repo = os.path.dirname(os.path.dirname(__file__))
    port = 23456
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER.replace('@REPO@', repo).replace('@PORT@', str(port)).replace('@PID@', str(pid))],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    import json

    losses = [
        json.loads(next(l for l in out.splitlines() if l.startswith("LOSSES")).split(" ", 1)[1])
        for out in outs
    ]
    # SPMD: every host computes the identical global loss.
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    assert losses[0][-1] < losses[0][0] + 0.5


WORKER_SP = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@",
    num_processes=2,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig, TrainConfig
from lb_wavenet_tpu.data import make_batches, synthetic_corpus
from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_params
from lb_wavenet_tpu.train import (
    init_state, make_sp_train_step, seq_batch_to_device,
)

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
window = 41  # T = 8 + 41 = 49 -> padded to 50; 25/shard >= halo 8
train = TrainConfig(batch_size=2, window_size=window, learning_rate=1e-3,
                    seed=0, seq_parallel=True)
assert jax.process_count() == 2
mesh = make_mesh(2, 1)  # time sharded across the two processes
corpus = synthetic_corpus(arch, window, n_files=2, file_len=400)
state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
# SP loaders are UNSHARDED: identical batch stream on every host.
batches = make_batches(corpus, train, host_id=0, host_count=1)
sp_step = make_sp_train_step(mesh, arch, train)
losses = []
for _ in range(3):
    batch = seq_batch_to_device(next(batches), mesh, window, arch=arch)
    state, loss = sp_step(state, batch)
    losses.append(float(loss))
print("LOSSES", json.dumps(losses), flush=True)
"""


def test_two_process_sequence_parallel_training():
    """Multi-host SP: the halo ppermute crosses PROCESS boundaries; both
    hosts compute the identical loss, equal to the single-process SP run."""
    import json

    repo = os.path.dirname(os.path.dirname(__file__))
    port = 23467
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process

    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER_SP.replace('@REPO@', repo).replace('@PORT@', str(port)).replace('@PID@', str(pid))],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = [
        json.loads(next(l for l in out.splitlines() if l.startswith("LOSSES")).split(" ", 1)[1])
        for out in outs
    ]
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # Single-process reference on the virtual mesh: identical math.
    import jax

    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_params
    from lb_wavenet_tpu.train import (
        init_state, make_sp_train_step, seq_batch_to_device,
    )

    arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                      skip_channels=8, gate_channels=8,
                      compute_dtype="float32")
    window = 41
    train = TrainConfig(batch_size=2, window_size=window, learning_rate=1e-3,
                        seed=0, seq_parallel=True)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    corpus = synthetic_corpus(arch, window, n_files=2, file_len=400)
    state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
    batches = make_batches(corpus, train, host_id=0, host_count=1)
    sp_step = make_sp_train_step(mesh, arch, train)
    ref = []
    for _ in range(3):
        batch = seq_batch_to_device(next(batches), mesh, window, arch=arch)
        state, loss = sp_step(state, batch)
        ref.append(float(loss))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-6)


WORKER_FLEET = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@",
    num_processes=2,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.parallel.mesh import make_mesh
from lb_wavenet_tpu.parallel.synthesis import fleet_generate_classes

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
assert jax.process_count() == 2
mesh = make_mesh(2, 1)  # one device per process: the fleet spans hosts
params = init_params(jax.random.key(0), arch)
out = fleet_generate_classes(
    params, arch, jax.random.key(9), 4, 12, mesh, engine="xla",
    temperature=0.0,
)
# Each host reports only ITS lanes (no replicated duplicate work).
shards = sorted(
    ((s.index[0].start or 0, np.asarray(s.data).tolist())
     for s in out.addressable_shards),
)
print("SHARDS", json.dumps(shards), flush=True)
"""


def test_two_process_fleet_generation():
    """Multi-host fleet synthesis: 2 jax.distributed processes shard the
    generation batch; the union of per-host lanes equals the single-device
    run lane-for-lane."""
    import json

    import jax

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params

    repo = os.path.dirname(os.path.dirname(__file__))
    port = 23478
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process

    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER_FLEET.replace('@REPO@', repo).replace(
                 '@PORT@', str(port)).replace('@PID@', str(pid))],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                      skip_channels=8, gate_channels=8,
                      compute_dtype="float32")
    params = init_params(jax.random.key(0), arch)
    ref = np.asarray(generate_classes(
        params, arch, jax.random.key(9), 4, 12, temperature=0.0
    ))

    rows_seen = {}
    for out in outs:
        shards = json.loads(next(
            l for l in out.splitlines() if l.startswith("SHARDS")
        ).split(" ", 1)[1])
        for start, data in shards:
            data = np.asarray(data)
            for i in range(data.shape[0]):
                assert start + i not in rows_seen  # disjoint host shards
                rows_seen[start + i] = data[i]
    assert sorted(rows_seen) == list(range(4))
    for lane, row in rows_seen.items():
        np.testing.assert_array_equal(row, ref[lane])


WORKER_TP = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@",
    num_processes=2,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import generate_classes
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.parallel.mesh import make_mesh
from lb_wavenet_tpu.parallel.synthesis import (
    ShardedSession, model_sharded_generate_classes,
)

arch = ArchConfig(n_blocks=2, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
assert jax.process_count() == 2
mesh = make_mesh(1, 2)   # MODEL axis spans the two processes
params = init_params(jax.random.key(0), arch)   # identical on both hosts
key = jax.random.key(31)
B, T = 4, 12

# Single-device reference, computed LOCALLY on each host's one device.
ref = np.asarray(generate_classes(
    params, arch, jax.random.fold_in(key, 0), B, T,
    engine="mega", temperature=1.0,
))
out = model_sharded_generate_classes(
    params, arch, key, B, T, mesh, engine="mega", temperature=1.0,
)
np.testing.assert_array_equal(np.asarray(out), ref)

# Model-sharded STREAMING across processes: chunked == one-shot.
sess = ShardedSession(params, arch, B, key, mesh, engine="mega")
c1 = np.asarray(sess.chunk(T // 2, temperature=1.0))
c2 = np.asarray(sess.chunk(T - T // 2, temperature=1.0))
np.testing.assert_array_equal(np.concatenate([c1, c2], axis=1), ref)
print("TP_OK", flush=True)
"""


def test_two_process_model_sharded_synthesis(tmp_path):
    """r4: the skip-split TP tier (one psum/step at the post hidden)
    crosses PROCESS boundaries — a model sharded over two hosts produces
    the single-device mega classes, one-shot AND streaming. On real
    hardware the psum rides ICI/DCN; here it rides the 2-process CPU
    collective, proving the program structure end to end."""
    repo = os.path.dirname(os.path.dirname(__file__))
    port = 23461
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process

    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER_TP.replace('@REPO@', repo).replace('@PORT@', str(port))
             .replace('@PID@', str(pid))],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert "TP_OK" in out
