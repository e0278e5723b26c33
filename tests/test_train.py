"""Integration tier (SURVEY.md §4): tiny end-to-end train -> checkpoint ->
resume -> loss decreases; resume is exact (params + opt state + data cursor)."""
import os

import jax
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
from lb_wavenet_tpu.data import synthetic_corpus
from lb_wavenet_tpu.train import run_training

from .util import MICRO


def _cfg(tmp, n_steps, ckpt_every, log_every=100):
    return Config(
        arch=MICRO,
        train=TrainConfig(
            batch_size=4,
            mesh_data=4,
            window_size=64,
            learning_rate=1e-3,
            n_steps=n_steps,
            log_every=log_every,
            checkpoint_every=ckpt_every,
            checkpoint_dir=str(tmp),
            seed=0,
        ),
    )


def test_train_decreases_loss_and_resumes_exactly(tmp_path):
    corpus = synthetic_corpus(MICRO, 64, n_files=2, file_len=2000)

    # Uninterrupted 16-step run.
    cfg_a = _cfg(tmp_path / "a", 16, 100)
    state_a = run_training(cfg_a, corpus=corpus)

    # Interrupted run: 8 steps, then resume to 16 in a new manager.
    cfg_b8 = _cfg(tmp_path / "b", 8, 100)
    run_training(cfg_b8, corpus=corpus)
    cfg_b16 = _cfg(tmp_path / "b", 16, 100)
    state_b = run_training(cfg_b16, corpus=corpus)

    assert int(state_a.step) == int(state_b.step) == 16
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        state_a.params,
        state_b.params,
    )


def test_loss_decreases(tmp_path):
    corpus = synthetic_corpus(MICRO, 64, n_files=2, file_len=2000)
    cfg = _cfg(tmp_path / "c", 60, 1000, log_every=10)

    losses = []

    import lb_wavenet_tpu.train as train_mod

    orig_log = train_mod.MetricsLogger.log

    def capture(self, **kw):
        if "loss" in kw:
            losses.append(kw["loss"])
        orig_log(self, **kw)

    train_mod.MetricsLogger.log = capture
    try:
        run_training(cfg, corpus=corpus)
    finally:
        train_mod.MetricsLogger.log = orig_log

    assert losses, "no loss records captured"
    # MICRO has 8 channels — expect clear movement down from ln(256)=5.545,
    # not convergence.
    assert losses[-1] < 5.4
    assert losses[-1] < losses[0] - 0.1
