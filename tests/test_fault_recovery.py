"""Failure-detection tier (SURVEY.md §5): kill a training process mid-run,
relaunch, verify clean auto-resume from the last checkpoint to completion."""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
from lb_wavenet_tpu.data import synthetic_corpus
from lb_wavenet_tpu.train import run_training

arch = ArchConfig(n_blocks=2, n_layers_per_block=3, residual_channels=8,
                  skip_channels=8, gate_channels=8, compute_dtype="float32")
cfg = Config(arch=arch, train=TrainConfig(
    batch_size=4, mesh_data=1, window_size=64, learning_rate=1e-3,
    n_steps=40, log_every=5, checkpoint_every=5, checkpoint_dir={ckpt!r}, seed=0))
corpus = synthetic_corpus(arch, 64, n_files=2, file_len=2000)
state = run_training(cfg, corpus=corpus)
print("DONE", int(state.step), flush=True)
"""


def test_kill_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    script = SCRIPT.format(repo=os.path.dirname(os.path.dirname(__file__)), ckpt=ckpt)

    env = dict(os.environ)
    # First launch: kill it once checkpoints appear (SIGKILL, no cleanup).
    p = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
    )
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        steps = [d for d in os.listdir(ckpt) if d.isdigit()] if os.path.isdir(ckpt) else []
        if steps and max(int(s) for s in steps) >= 5:
            p.kill()  # exact PID, hard kill mid-training
            killed = True
            break
        if p.poll() is not None:
            break
        time.sleep(0.5)
    p.wait(timeout=60)
    assert killed, "training finished before it could be killed; lower n_steps"

    # Relaunch: must auto-resume from the last finalized checkpoint and finish.
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "DONE 40" in out.stdout, out.stdout + out.stderr
    # The resumed run started from a checkpoint, not from scratch: its first
    # logged step must be > 5.
    first_log = next(
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    )
    assert first_log["step"] > 5
