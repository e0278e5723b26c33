"""Multi-host hardening at this rig's ceiling (VERDICT r4 item 5): REAL
4-process jax.distributed CPU runs — a (data x model) mesh spanning four
processes through the TP train step, the SP halo ring across four hosts,
restart-based recovery of a model-sharded STREAMING run after a SIGKILLed
host, and a sharded checkpoint restored onto a DIFFERENT process count.
"""
import json
import os
import signal
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(__file__))


def _run_workers(worker_src, n, port, timeout=420, env_extra=None,
                 expect_fail=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env.update(env_extra or {})
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             worker_src.replace("@REPO@", REPO)
             .replace("@PORT@", str(port)).replace("@PID@", str(pid))
             .replace("@N@", str(n))],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(n)
    ]
    outs = []
    try:
        for pid, p in enumerate(procs):
            try:
                out, err = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()  # exact PID of a process we started
                out, err = p.communicate()
                if pid not in expect_fail:
                    raise AssertionError(
                        f"worker {pid} timed out:\n{out}\n{err}"
                    )
            if pid not in expect_fail:
                assert p.returncode == 0, (
                    f"worker {pid} failed:\n{out}\n{err}"
                )
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


WORKER_TP_TRAIN = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@", num_processes=@N@,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig, TrainConfig
from lb_wavenet_tpu.data import make_batches, synthetic_corpus
from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from lb_wavenet_tpu.train import init_state, make_tp_train_step

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=16, gate_channels=8, compute_dtype="float32")
train = TrainConfig(batch_size=4, window_size=32, learning_rate=1e-3, seed=0)
assert jax.process_count() == 4
mesh = make_mesh(2, 2)  # data x model, each axis SPANNING processes
corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)
state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
batches = make_batches(corpus, train, host_id=0, host_count=1)
step = make_tp_train_step(mesh, arch, train)
losses = []
for _ in range(2):
    b = next(batches)
    batch = shard_batch({"inputs": b.inputs, "targets": b.targets,
                         "mask": b.mask}, mesh)
    state, loss = step(state, batch)
    losses.append(float(loss))
print("LOSSES", json.dumps(losses), flush=True)
"""


def test_four_process_data_model_mesh_tp_training():
    """The skip-split TP train step over a (2 data x 2 model) mesh whose
    BOTH axes cross process boundaries: every host sees the identical
    loss, equal to the single-process run on a virtual mesh."""
    outs = _run_workers(WORKER_TP_TRAIN, 4, 23490)
    losses = [
        json.loads(next(
            l for l in out.splitlines() if l.startswith("LOSSES")
        ).split(" ", 1)[1])
        for out in outs
    ]
    for other in losses[1:]:
        np.testing.assert_allclose(losses[0], other, rtol=0, atol=0)

    # Single-process reference on the 8-virtual-device mesh.
    import jax

    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_params,
    )
    from lb_wavenet_tpu.train import init_state, make_tp_train_step

    arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                      skip_channels=16, gate_channels=8,
                      compute_dtype="float32")
    train = TrainConfig(batch_size=4, window_size=32, learning_rate=1e-3,
                        seed=0)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)
    state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
    batches = make_batches(corpus, train, host_id=0, host_count=1)
    step = make_tp_train_step(mesh, arch, train)
    ref = []
    for _ in range(2):
        b = next(batches)
        batch = shard_batch({"inputs": b.inputs, "targets": b.targets,
                             "mask": b.mask}, mesh)
        state, loss = step(state, batch)
        ref.append(float(loss))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-6)


WORKER_SP4 = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@", num_processes=@N@,
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
window = 56  # T = 8 + 56 = 64 -> 16/shard >= halo 8
train = TrainConfig(batch_size=2, window_size=window, learning_rate=1e-3,
                    seed=0, seq_parallel=True)
assert jax.process_count() == 4
mesh = make_mesh(4, 1)  # time sharded across FOUR processes
corpus = synthetic_corpus(arch, window, n_files=2, file_len=400)
state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
batches = make_batches(corpus, train, host_id=0, host_count=1)
sp_step = make_sp_train_step(mesh, arch, train)
losses = []
for _ in range(2):
    batch = seq_batch_to_device(next(batches), mesh, window, arch=arch)
    state, loss = sp_step(state, batch)
    losses.append(float(loss))
print("LOSSES", json.dumps(losses), flush=True)
"""


def test_four_process_sequence_parallel_halo():
    """The SP halo ppermute ring crosses THREE process boundaries (4 time
    shards, one per host); all hosts agree and match the single-process
    virtual-mesh run."""
    outs = _run_workers(WORKER_SP4, 4, 23491)
    losses = [
        json.loads(next(
            l for l in out.splitlines() if l.startswith("LOSSES")
        ).split(" ", 1)[1])
        for out in outs
    ]
    for other in losses[1:]:
        np.testing.assert_allclose(losses[0], other, rtol=0, atol=0)

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
    window = 56
    train = TrainConfig(batch_size=2, window_size=window, learning_rate=1e-3,
                        seed=0, seq_parallel=True)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    corpus = synthetic_corpus(arch, window, n_files=2, file_len=400)
    state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
    batches = make_batches(corpus, train, host_id=0, host_count=1)
    sp_step = make_sp_train_step(mesh, arch, train)
    ref = []
    for _ in range(2):
        batch = seq_batch_to_device(next(batches), mesh, window, arch=arch)
        state, loss = sp_step(state, batch)
        ref.append(float(loss))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-6)


WORKER_TP_STREAM_KILL = r"""
import os, signal, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@", num_processes=@N@,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.parallel.mesh import make_mesh
from lb_wavenet_tpu.parallel.synthesis import ShardedSession

arch = ArchConfig(n_blocks=2, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
mesh = make_mesh(1, 2)   # model axis spans the two processes
params = init_params(jax.random.key(0), arch)
key = jax.random.key(31)
B, CH = 4, 6
sess = ShardedSession(params, arch, B, key, mesh, engine="turbo")
chunks = []
KILLAT = int(os.environ.get("KILLAT", "0"))
for i in range(3):
    if KILLAT and jax.process_index() == 1 and i == KILLAT:
        os.kill(os.getpid(), signal.SIGKILL)  # hard host loss mid-stream
    chunks.append(np.asarray(sess.chunk(CH, temperature=1.0)))
print("CLASSES", json.dumps(np.concatenate(chunks, 1).tolist()), flush=True)
"""


def test_tp_streaming_host_killed_then_relaunched():
    """Fault model for model-sharded STREAMING (SURVEY.md §5: recovery =
    restart, there is no partial-fleet continuation): SIGKILL one host
    mid-stream — the survivor cannot complete — then relaunch the fleet;
    the rerun's output is deterministic (per-lane hash sampling), equal to
    the single-device turbo stream, so the request replays exactly."""
    import jax

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params

    # Launch 1: host 1 dies before its 2nd chunk; host 0 must NOT produce
    # a final CLASSES line (it cannot silently continue without its peer).
    outs = _run_workers(
        WORKER_TP_STREAM_KILL, 2, 23492, timeout=180,
        env_extra={"KILLAT": "1"}, expect_fail=(0, 1),
    )
    assert not any("CLASSES" in o for o in outs)

    # Launch 2 (the recovery): full fleet relaunch completes and replays
    # the identical stream.
    outs = _run_workers(
        WORKER_TP_STREAM_KILL, 2, 23493, env_extra={"KILLAT": "0"}
    )
    got = None
    for out in outs:
        line = next(
            (l for l in out.splitlines() if l.startswith("CLASSES")), None
        )
        if line:
            got = np.asarray(json.loads(line.split(" ", 1)[1]))
    assert got is not None

    arch = ArchConfig(n_blocks=2, n_layers_per_block=3, residual_channels=8,
                      skip_channels=8, gate_channels=8,
                      compute_dtype="float32")
    params = init_params(jax.random.key(0), arch)
    ref = np.asarray(generate_classes(
        params, arch, jax.random.fold_in(jax.random.key(31), 0), 4, 18,
        engine="turbo", temperature=1.0,
    ))
    np.testing.assert_array_equal(got, ref)


WORKER_CKPT4 = r"""
import os, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@", num_processes=@N@,
    process_id=@PID@,
)
import numpy as np
from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
from lb_wavenet_tpu.data import synthetic_corpus
from lb_wavenet_tpu.train import run_training
from lb_wavenet_tpu.utils.multihost import params_checksum

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=16, gate_channels=8, compute_dtype="float32")
cfg = Config(arch=arch, train=TrainConfig(
    batch_size=4, mesh_data=2, mesh_model=2, window_size=32,
    learning_rate=1e-3, n_steps=3, log_every=3, checkpoint_every=3,
    checkpoint_dir=os.environ["CKPT_DIR"], seed=0))
corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)
state = run_training(cfg, corpus=corpus)
print("CSUM", float(params_checksum(state.params)), flush=True)
"""


def test_sharded_checkpoint_restores_onto_different_process_count(tmp_path):
    """A checkpoint written by a 4-process (2 data x 2 model) GSPMD
    training run restores into THIS single process on an 8-virtual-device
    mesh — orbax checkpoints are sharding-agnostic (SURVEY.md §5
    'restore onto a different mesh works'), params bit-equal by checksum,
    and training continues."""
    ckpt = str(tmp_path / "ck4")
    outs = _run_workers(
        WORKER_CKPT4, 4, 23494, env_extra={"CKPT_DIR": ckpt}
    )
    csums = [
        float(next(
            l for l in out.splitlines() if l.startswith("CSUM")
        ).split(" ", 1)[1])
        for out in outs
    ]
    assert len(set(round(c, 5) for c in csums)) == 1

    from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
    from lb_wavenet_tpu.data import synthetic_corpus
    from lb_wavenet_tpu.train import run_training
    from lb_wavenet_tpu.utils.multihost import params_checksum

    arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                      skip_channels=16, gate_channels=8,
                      compute_dtype="float32")
    # Different topology: ONE process, 4 virtual devices on a (4, 1) mesh.
    cfg = Config(arch=arch, train=TrainConfig(
        batch_size=4, mesh_data=4, mesh_model=1, window_size=32,
        learning_rate=1e-3, n_steps=3, log_every=3, checkpoint_every=0,
        checkpoint_dir=ckpt, seed=0))
    corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)
    state = run_training(cfg, corpus=corpus)  # restores step 3: no retrain
    assert int(state.step) == 3
    np.testing.assert_allclose(
        float(params_checksum(state.params)), csums[0], rtol=1e-6
    )

    # And it CONTINUES onto the new mesh: one more step from the restore.
    cfg5 = Config(arch=arch, train=TrainConfig(
        batch_size=4, mesh_data=4, mesh_model=1, window_size=32,
        learning_rate=1e-3, n_steps=4, log_every=4, checkpoint_every=0,
        checkpoint_dir=ckpt, seed=0))
    state = run_training(cfg5, corpus=corpus)
    assert int(state.step) == 4
