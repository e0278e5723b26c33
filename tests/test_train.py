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


def test_checkpoint_restores_onto_different_mesh(tmp_path):
    """Sharding-agnostic checkpoints (SURVEY.md §5): save on a 4-way data
    mesh, restore onto a 2x2 data x model mesh."""
    import jax
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_params
    from lb_wavenet_tpu.train import init_state, train_step
    from lb_wavenet_tpu.utils import checkpoint as ckpt_lib

    corpus = synthetic_corpus(MICRO, 64, n_files=2, file_len=2000)
    cfg = _cfg(tmp_path / "m", 4, 4)
    state_a = run_training(cfg, corpus=corpus)  # saved on mesh (4, 1)

    mesh_b = make_mesh(2, 2)
    template = shard_params(
        init_state(jax.random.key(0), cfg.arch, cfg.train), mesh_b
    )
    manager = ckpt_lib.make_manager(str(tmp_path / "m"))
    restored, step = ckpt_lib.restore_if_available(manager, template)
    assert step == 4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state_a.params,
        restored.params,
    )
    # And the restored state trains on the new mesh.
    import numpy as _np
    from lb_wavenet_tpu.parallel.mesh import shard_batch

    rng = _np.random.default_rng(0)
    r = MICRO.receptive_field
    batch = shard_batch(
        {
            "inputs": rng.integers(0, 256, (4, r - 1 + 64)).astype(_np.int32),
            "targets": rng.integers(0, 256, (4, 64)).astype(_np.int32),
            "mask": _np.ones((4, 64), _np.float32),
        },
        mesh_b,
    )
    restored, loss = train_step(restored, batch, cfg.arch, cfg.train)
    assert _np.isfinite(float(loss))


def test_metrics_tensorboard_writer(tmp_path):
    """SURVEY.md §5: optional TensorBoard event stream mirrors JSONL scalars."""
    pytest.importorskip("torch.utils.tensorboard")
    from lb_wavenet_tpu.utils.metrics import MetricsLogger

    tb_dir = str(tmp_path / "tb")
    m = MetricsLogger(tensorboard_dir=tb_dir)
    m.log(step=3, loss=1.25, samples_per_sec=1000.0, note="text-skipped")
    m.close()
    import glob

    events = glob.glob(tb_dir + "/events.out.tfevents.*")
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(events[0]) > 0


def test_grad_accum_matches_unaccumulated_step():
    """grad_accum=2 over the SAME total batch == the one-shot step exactly
    (loss AND updated params), including ragged boundary masks — the
    numerator/denominator accumulation keeps the masked mean exact."""
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from lb_wavenet_tpu.train import init_state, train_step

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    rng = np.random.default_rng(3)
    r, w, b = MICRO.receptive_field, 32, 4
    mask = np.ones((b, w), np.float32)
    mask[0, 20:] = 0.0   # ragged masks: micro denominators differ
    mask[2, :5] = 0.0
    raw = {
        "inputs": rng.integers(0, 256, (b, r - 1 + w)).astype(np.int32),
        "targets": rng.integers(0, 256, (b, w)).astype(np.int32),
        "mask": mask,
    }
    losses, states = [], []
    for k in (1, 2, 4):
        train = TrainConfig(batch_size=b, window_size=w, learning_rate=1e-3,
                            grad_accum=k)
        state = shard_params(init_state(jax.random.key(0), MICRO, train), mesh)
        state, loss = train_step(state, shard_batch(raw, mesh), MICRO, train)
        losses.append(float(loss))
        states.append(state)
    for i in (1, 2):
        assert np.allclose(losses[0], losses[i], rtol=1e-6), losses
        jax.tree_util.tree_map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-7
            ),
            states[0].params,
            states[i].params,
        )


def test_grad_accum_rejects_indivisible_batch():
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from lb_wavenet_tpu.train import init_state, train_step

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    train = TrainConfig(batch_size=3, window_size=16, grad_accum=2)
    state = shard_params(init_state(jax.random.key(0), MICRO, train), mesh)
    r = MICRO.receptive_field
    raw = {
        "inputs": np.zeros((3, r - 1 + 16), np.int32),
        "targets": np.zeros((3, 16), np.int32),
        "mask": np.ones((3, 16), np.float32),
    }
    with pytest.raises(ValueError, match="divisible"):
        train_step(state, shard_batch(raw, mesh), MICRO, train)
