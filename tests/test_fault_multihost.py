"""Failure-detection tier, multi-host (SURVEY.md §5): kill ONE HOST of a
2-process jax.distributed CPU training run mid-step (SIGKILL, no cleanup),
then relaunch the fleet and verify clean auto-resume from the last finalized
checkpoint to completion, with replicated final params."""
import os
import signal
import subprocess
import sys
import time

import numpy as np

WORKER = r"""
import os, signal, sys, json
sys.path.insert(0, '@REPO@')
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:@PORT@",
    num_processes=2,
    process_id=@PID@,
)
from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
from lb_wavenet_tpu.data import synthetic_corpus
import lb_wavenet_tpu.train as tm

arch = ArchConfig(n_blocks=1, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
cfg = Config(arch=arch, train=TrainConfig(
    batch_size=4, mesh_data=2, window_size=32, learning_rate=1e-3,
    n_steps=30, log_every=5, checkpoint_every=5, checkpoint_dir='@CKPT@',
    seed=0))
corpus = synthetic_corpus(arch, 32, n_files=2, file_len=500)

KILLAT = @KILLAT@
_orig = tm.train_step
_n = [0]

def patched(state, batch, arch, train):
    _n[0] += 1
    if KILLAT and jax.process_index() == 1 and _n[0] == KILLAT:
        os.kill(os.getpid(), signal.SIGKILL)   # hard host failure, no cleanup
    return _orig(state, batch, arch, train)

tm.train_step = patched
state = tm.run_training(cfg, corpus=corpus)
from lb_wavenet_tpu.utils.multihost import assert_replicated_params
assert_replicated_params(state.params, 3)
import numpy as np
leaves = jax.tree_util.tree_leaves(state.params)
csum = float(sum(abs(np.asarray(x)).sum() for x in leaves))
print("DONE", int(state.step), round(csum, 6), flush=True)
"""


def _launch(repo, port, ckpt, killat, env):
    return [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                WORKER.replace("@REPO@", repo)
                .replace("@PORT@", str(port))
                .replace("@PID@", str(pid))
                .replace("@CKPT@", ckpt)
                .replace("@KILLAT@", str(killat)),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]


def test_kill_one_host_and_fleet_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(__file__))
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process

    # Phase 1: host 1 SIGKILLs itself mid-run (after checkpoints exist).
    procs = _launch(repo, 23567, ckpt, killat=12, env=env)
    # Host 1 dies by SIGKILL.
    procs[1].wait(timeout=420)
    assert procs[1].returncode == -signal.SIGKILL
    # Host 0 is now wedged in a collective against a dead peer (or erroring
    # out via the coordinator); the fleet manager's job is to tear it down.
    try:
        procs[0].wait(timeout=30)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        procs[0].wait(timeout=60)
    else:
        pass  # died on its own (coordinator heartbeat) — equally fine
    # Drain pipes so nothing blocks.
    for p in procs:
        p.communicate()

    # A checkpoint from before the fault must exist and be finalized.
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no checkpoint survived"

    # Phase 2: relaunch the fleet (fresh coordinator port) — it must
    # auto-resume from the last finalized step and run to completion.
    procs = _launch(repo, 23568, ckpt, killat=0, env=env)
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"recovery worker failed:\n{out}\n{err}"
        outs.append(out)
    done = [
        next(l for l in out.splitlines() if l.startswith("DONE")).split()
        for out in outs
    ]
    steps = [int(d[1]) for d in done]
    csums = [float(d[2]) for d in done]
    assert steps == [30, 30]
    # Both hosts hold identical final params (and the run really resumed —
    # it trained past the kill step without restarting from scratch).
    np.testing.assert_allclose(csums[0], csums[1], rtol=0, atol=0)
