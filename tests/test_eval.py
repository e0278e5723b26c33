"""Held-out evaluation, LR schedules, and EMA (eval.py + train.py).

SURVEY.md §4 notes the reference had no eval split; eval is a build-side
subsystem, so these tests pin ITS contract: exact masked aggregation
(batch-size invariance), agreement with a manually computed sweep, schedule
host/device agreement, and the EMA update + restore path.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import Config, TrainConfig
from lb_wavenet_tpu.data import synthetic_corpus
from lb_wavenet_tpu.eval import evaluate
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.train import (
    TrainState,
    init_state,
    lr_at,
    make_lr_schedule,
    run_training,
    train_step,
)

from .util import MICRO, fwd

WINDOW = 32


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(MICRO, WINDOW, n_files=2, file_len=200, seed=3)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(1), MICRO)


def _manual_sweep(params, corpus):
    """Per-window forward + masked sums, independent of eval.py's batching."""
    nll_sum = correct_sum = mask_sum = 0.0
    for fi, wi in corpus.index:
        inputs, targets, mask = corpus.example(fi, wi)
        logits = np.asarray(fwd(params, MICRO, jnp.asarray(inputs[None])))
        w_logits = logits[0, -WINDOW:, :]
        logp = w_logits - np.log(
            np.exp(w_logits - w_logits.max(-1, keepdims=True)).sum(
                -1, keepdims=True
            )
        ) - w_logits.max(-1, keepdims=True)
        nll = -logp[np.arange(WINDOW), targets]
        correct = (w_logits.argmax(-1) == targets).astype(np.float32)
        nll_sum += float((nll * mask).sum())
        correct_sum += float((correct * mask).sum())
        mask_sum += float(mask.sum())
    return nll_sum / mask_sum, correct_sum / mask_sum, mask_sum


def test_evaluate_matches_manual_sweep(params, corpus):
    got = evaluate(params, MICRO, corpus, batch_size=4)
    nll, acc, n = _manual_sweep(params, corpus)
    assert got["nll"] == pytest.approx(nll, rel=1e-5)
    assert got["accuracy"] == pytest.approx(acc, rel=1e-5)
    assert got["n_samples"] == int(n)
    assert got["bits_per_sample"] == pytest.approx(nll / np.log(2), rel=1e-5)


def test_evaluate_batch_size_invariant(params, corpus):
    """Padding of the last partial batch must not change the aggregates."""
    a = evaluate(params, MICRO, corpus, batch_size=4)
    b = evaluate(params, MICRO, corpus, batch_size=8)
    assert a["nll"] == pytest.approx(b["nll"], rel=1e-6)
    assert a["accuracy"] == pytest.approx(b["accuracy"], rel=1e-6)
    assert a["n_samples"] == b["n_samples"]


def test_evaluate_max_batches_truncates(params, corpus):
    full = evaluate(params, MICRO, corpus, batch_size=4)
    part = evaluate(params, MICRO, corpus, batch_size=4, max_batches=1)
    assert part["n_windows"] == 4 < full["n_windows"]
    assert part["n_samples"] < full["n_samples"]


@pytest.mark.parametrize(
    "kind,warm", [("constant", 0), ("constant", 5), ("cosine", 3),
                  ("linear", 0), ("exponential", 4)]
)
def test_lr_schedule_host_mirror(kind, warm):
    train = TrainConfig(
        learning_rate=3e-4, lr_schedule=kind, warmup_steps=warm,
        n_steps=40, decay_steps=20, lr_min_ratio=0.1,
    )
    sched = make_lr_schedule(train)
    for step in [0, 1, warm, warm + 1, 10, 25, 40, 60]:
        assert float(sched(step)) == pytest.approx(
            lr_at(train, step), rel=1e-5, abs=1e-12
        ), (kind, step)


def test_lr_schedule_rejects_unknown():
    with pytest.raises(ValueError):
        make_lr_schedule(TrainConfig(lr_schedule="nope"))


def _tiny_batch(corpus, train):
    from lb_wavenet_tpu.data import make_batches

    b = next(make_batches(corpus, train))
    return {"inputs": b.inputs, "targets": b.targets, "mask": b.mask}


def test_ema_tracks_param_trajectory(corpus):
    d = 0.5
    train = TrainConfig(
        batch_size=2, window_size=WINDOW, ema_decay=d, learning_rate=1e-3
    )
    state = init_state(jax.random.key(0), MICRO, train)
    expect = jax.tree_util.tree_map(np.asarray, state.params)
    batch = _tiny_batch(corpus, train)
    for _ in range(3):
        state, _ = train_step(state, dict(batch), MICRO, train)
        p_now = jax.tree_util.tree_map(np.asarray, state.params)
        expect = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1 - d), expect, p_now
        )
    got = jax.tree_util.tree_map(np.asarray, state.ema)
    for g, e in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-7)
    # EMA must differ from the live params after updates.
    flat_p = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params)
    )
    assert any(
        not np.allclose(g, p)
        for g, p in zip(jax.tree_util.tree_leaves(got), flat_p)
    )


def test_ema_disabled_state_is_empty(corpus):
    train = TrainConfig(batch_size=2, window_size=WINDOW)
    state = init_state(jax.random.key(0), MICRO, train)
    assert state.ema == ()
    state, _ = train_step(
        state, _tiny_batch(corpus, train), MICRO, train
    )
    assert state.ema == ()


def test_training_eval_logging_and_ema_restore(tmp_path, corpus):
    from lb_wavenet_tpu.utils.checkpoint import restore_params

    metrics_path = str(tmp_path / "metrics.jsonl")
    cfg = Config.from_dict(
        {
            "arch": {
                "n_blocks": 2, "n_layers_per_block": 3,
                "residual_channels": 8, "skip_channels": 8,
                "gate_channels": 8, "compute_dtype": "float32",
            },
            "train": {
                "batch_size": 2, "window_size": WINDOW, "n_steps": 4,
                "mesh_data": 2, "log_every": 2, "checkpoint_every": 4,
                "eval_every": 2, "eval_batch_size": 4, "ema_decay": 0.9,
                "lr_schedule": "cosine", "warmup_steps": 2,
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "metrics_path": metrics_path,
            },
        }
    )
    arch = cfg.arch
    corpus2 = synthetic_corpus(arch, WINDOW, n_files=2, file_len=200, seed=3)
    state = run_training(cfg, corpus=corpus2, eval_corpus=corpus2)

    import json

    records = [
        json.loads(line) for line in open(metrics_path) if line.strip()
    ]
    eval_recs = [r for r in records if "eval_nll" in r]
    loss_recs = [r for r in records if "loss" in r]
    assert eval_recs and loss_recs
    assert all(np.isfinite(r["eval_nll"]) for r in eval_recs)
    assert all(0 <= r["eval_accuracy"] <= 1 for r in eval_recs)
    assert "eval_ema_nll" in eval_recs[-1]  # ema_decay > 0 -> EMA eval too
    # warmup peak at step 2; cosine fully decayed (lr_min_ratio=0) by step 4.
    assert [r["lr"] for r in loss_recs] == [
        pytest.approx(lr_at(cfg.train, r["step"])) for r in loss_recs
    ]
    assert loss_recs[0]["lr"] > 0

    # EMA restore path: distinct from live params, equal to state.ema.
    ema = restore_params(
        cfg.train.checkpoint_dir,
        init_state(jax.random.key(0), arch, cfg.train),
        prefer_ema=True,
    )
    for g, e in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(state.ema)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


def test_restore_ema_requires_ema_checkpoint(tmp_path, corpus):
    from lb_wavenet_tpu.utils.checkpoint import restore_params

    cfg = Config.from_dict(
        {
            "arch": {
                "n_blocks": 2, "n_layers_per_block": 3,
                "residual_channels": 8, "skip_channels": 8,
                "gate_channels": 8, "compute_dtype": "float32",
            },
            "train": {
                "batch_size": 2, "window_size": WINDOW, "n_steps": 1,
                "mesh_data": 2, "log_every": 1, "checkpoint_every": 1,
                "checkpoint_dir": str(tmp_path / "ckpt"),
            },
        }
    )
    corpus2 = synthetic_corpus(cfg.arch, WINDOW, n_files=1, file_len=200)
    run_training(cfg, corpus=corpus2)
    with pytest.raises(ValueError, match="no EMA"):
        restore_params(
            cfg.train.checkpoint_dir,
            init_state(jax.random.key(0), cfg.arch, cfg.train),
            prefer_ema=True,
        )


def test_eval_fused_path_matches_xla():
    """fused=True runs the Pallas training-stack kernel inside eval_step
    (in-training eval reuses the production path, VERDICT r4 weak #8);
    metrics match the plain-XLA sweep to float tolerance."""
    import jax

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.eval import evaluate
    from lb_wavenet_tpu.models.wavenet import init_params

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    corpus = synthetic_corpus(arch, 64, n_files=2, file_len=500)
    params = init_params(jax.random.key(0), arch)
    plain = evaluate(params, arch, corpus, batch_size=4)
    fused = evaluate(params, arch, corpus, batch_size=4, fused=True,
                     tapcat=True)
    assert abs(plain["nll"] - fused["nll"]) < 1e-5
    assert abs(plain["accuracy"] - fused["accuracy"]) < 1e-6
    assert plain["n_samples"] == fused["n_samples"]
