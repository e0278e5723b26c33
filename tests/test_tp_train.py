"""Model-sharded TRAINING at kernel speed (train.make_tp_train_step).

VERDICT r4 item 2 / SURVEY.md §2.3 TP row: symmetric to the TP synthesis
tiers, training shards the skip/post dims over the `model` mesh axis with
the skip-split layout (parallel/synthesis.skip_sharded_param_specs) under
shard_map — the fused Pallas training kernels run per shard emitting the
LOCAL skip slice, one psum completes the post hidden. These tests pin the
whole step (loss AND the optimizer-updated params, i.e. the grads) to the
unsharded train_step on CPU meshes, including the S=512 stress width, the
fused-kernel path, grad_accum, and mel/speaker conditioning.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig, TrainConfig
from lb_wavenet_tpu.data import make_batches, synthetic_corpus
from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from lb_wavenet_tpu.train import init_state, make_tp_train_step, train_step


def _batch_dict(arch, train, with_mel=False, speakers=None, seed=0):
    corpus = synthetic_corpus(
        arch, train.window_size, n_files=2, file_len=1200, seed=seed
    )
    if speakers is not None:
        corpus.speakers = speakers
    b = next(make_batches(corpus, train, with_mel=with_mel))
    d = {"inputs": b.inputs, "targets": b.targets, "mask": b.mask}
    if b.mel is not None:
        d["mel"] = b.mel
    if b.speaker is not None:
        d["speaker"] = b.speaker
    return d


def _run_both(arch, train, mesh_shape, bd, steps=2):
    """(unsharded_state, tp_state, losses) after `steps` identical steps."""
    s0 = init_state(jax.random.key(0), arch, train)
    s1 = init_state(jax.random.key(0), arch, train)
    mesh = make_mesh(*mesh_shape)
    s1 = shard_params(s1, mesh)
    tp = make_tp_train_step(mesh, arch, train)
    losses = []
    for _ in range(steps):
        s0, l0 = train_step(
            s0, {k: jnp.asarray(v) for k, v in bd.items()}, arch, train
        )
        s1, l1 = tp(s1, shard_batch(bd, mesh))
        losses.append((float(l0), float(l1)))
    return s0, s1, losses


def _assert_states_close(s0, s1, atol):
    def chk(a, b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=0
        )

    jax.tree_util.tree_map(chk, s0.params, s1.params)


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2), (1, 4)])
def test_tp_step_matches_unsharded_xla(mesh_shape):
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=4, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=4, window_size=96, learning_rate=1e-3)
    bd = _batch_dict(arch, train)
    s0, s1, losses = _run_both(arch, train, mesh_shape, bd)
    for l0, l1 in losses:
        assert abs(l0 - l1) < 1e-5
    _assert_states_close(s0, s1, atol=2e-6)


def test_tp_step_stress_width_s512():
    """The stress config's defining dimension (S=512) — the width that
    motivates model sharding — splits 4 ways exactly."""
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=2, residual_channels=16,
        skip_channels=512, gate_channels=16, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=2, window_size=48, learning_rate=1e-3)
    bd = _batch_dict(arch, train)
    s0, s1, losses = _run_both(arch, train, (2, 4), bd, steps=1)
    assert abs(losses[0][0] - losses[0][1]) < 2e-5
    _assert_states_close(s0, s1, atol=5e-6)


def test_tp_step_fused_kernels_match_unsharded_fused():
    """The point of the TP step: the fused Pallas production recipe
    (fused_stack + tapcat + fused_frontend) runs PER SHARD on its skip
    slice and still reproduces the unsharded fused step."""
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    train = TrainConfig(
        batch_size=2, window_size=64, learning_rate=1e-3,
        fused_stack=True, tapcat=True, fused_frontend=True,
    )
    bd = _batch_dict(arch, train)
    s0, s1, losses = _run_both(arch, train, (1, 2), bd, steps=1)
    assert abs(losses[0][0] - losses[0][1]) < 1e-5
    _assert_states_close(s0, s1, atol=2e-6)


def test_tp_step_grad_accum_exact():
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    base = dict(batch_size=4, window_size=64, learning_rate=1e-3)
    train1 = TrainConfig(**base)
    trainK = TrainConfig(**base, grad_accum=2)
    bd = _batch_dict(arch, train1)

    mesh = make_mesh(1, 2)
    sA = shard_params(init_state(jax.random.key(0), arch, train1), mesh)
    sB = shard_params(init_state(jax.random.key(0), arch, trainK), mesh)
    tA = make_tp_train_step(mesh, arch, train1)
    tB = make_tp_train_step(mesh, arch, trainK)
    sA, lA = tA(sA, shard_batch(bd, mesh))
    sB, lB = tB(sB, shard_batch(bd, mesh))
    assert abs(float(lA) - float(lB)) < 1e-5
    _assert_states_close(sA, sB, atol=2e-6)


def test_tp_step_mel_and_speaker_cond():
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, n_mels=8, cond_channels=8,
        upsample_factors=(4, 4), n_speakers=3, speaker_embed_dim=4,
        compute_dtype="float32",
    )
    train = TrainConfig(batch_size=2, window_size=64, learning_rate=1e-3)
    bd = _batch_dict(arch, train, with_mel=True, speakers=[0, 2])
    assert "mel" in bd and "speaker" in bd
    s0, s1, losses = _run_both(arch, train, (2, 2), bd, steps=1)
    assert abs(losses[0][0] - losses[0][1]) < 1e-5
    _assert_states_close(s0, s1, atol=2e-6)


def test_tp_step_validation():
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=2, residual_channels=8,
        skip_channels=30, gate_channels=8, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=2, window_size=32)
    with pytest.raises(ValueError, match="skip_channels"):
        make_tp_train_step(make_mesh(1, 4), arch, train)


def test_run_training_routes_fused_model_axis_to_tp_step(tmp_path):
    """End-to-end: run_training with mesh_model=2 + fused_stack now TRAINS
    (the r4 silent trap is a working path; loss decreases, checkpoints
    land)."""
    from lb_wavenet_tpu.config import Config
    from lb_wavenet_tpu.train import run_training

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    train = TrainConfig(
        batch_size=2, window_size=64, n_steps=6, log_every=3,
        learning_rate=1e-2, checkpoint_every=6,
        checkpoint_dir=str(tmp_path / "ck"), mesh_data=2, mesh_model=2,
        fused_stack=True, tapcat=True,
    )
    corpus = synthetic_corpus(arch, train.window_size, n_files=2,
                              file_len=1200)
    state = run_training(Config(arch=arch, train=train), corpus=corpus)
    assert int(state.step) == 6
