"""Distributed tier (SURVEY.md §4): halo-exchange sequence parallelism ==
unsharded forward/loss/grads, on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.models.wavenet import forward, init_params
from lb_wavenet_tpu.parallel.halo import (
    sequence_parallel_logits,
    sequence_parallel_loss,
)
from lb_wavenet_tpu.parallel.mesh import make_mesh

from .util import MICRO

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)

B, T = 2, 128  # T divisible by 4 shards; R = 16


def _setup():
    params = init_params(jax.random.key(0), MICRO)
    x = jax.random.randint(jax.random.key(1), (B, T), 0, 256)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    return params, x, mesh


def test_sp_logits_match_unsharded():
    params, x, mesh = _setup()
    ref = jax.jit(lambda p, x: forward(p, MICRO, x))(params, x)
    sp = jax.jit(
        lambda p, x: sequence_parallel_logits(p, MICRO, x, mesh)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_sp_logits_match_with_nonzero_biases():
    """Regression: trained-model regime (nonzero biases everywhere).

    init_params zero-initializes biases, which HID a halo bug: zeroing
    only the masked embeddings lets shard 0's halo rows carry
    bias-propagated activations where the unsharded forward's shift_right
    pads activation ZEROS — first caught with perturbed params (the
    forward now re-masks the residual stream after every layer)."""
    params, x, mesh = _setup()
    params = jax.tree_util.tree_map(
        lambda a: a
        + 0.1 * jax.random.normal(jax.random.key(a.size % 997), a.shape),
        params,
    )
    ref = jax.jit(lambda p, x: forward(p, MICRO, x))(params, x)
    sp = jax.jit(
        lambda p, x: sequence_parallel_logits(p, MICRO, x, mesh)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_sp_loss_and_grads_match_unsharded():
    params, x, mesh = _setup()
    targets = jax.random.randint(jax.random.key(2), (B, T), 0, 256)
    # Train only positions with full receptive field, as the data layer does.
    loss_mask = jnp.broadcast_to(
        (jnp.arange(T) >= MICRO.receptive_field).astype(jnp.float32), (B, T)
    )

    def ref_loss(p):
        logits = forward(p, MICRO, x)
        ce = -jax.nn.log_softmax(logits, axis=-1)
        ce = jnp.take_along_axis(ce, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * loss_mask) / jnp.sum(loss_mask)

    def sp_loss(p):
        return sequence_parallel_loss(p, MICRO, x, targets, loss_mask, mesh)

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params)
    l_sp, g_sp = jax.jit(jax.value_and_grad(sp_loss))(params)
    assert np.allclose(float(l_ref), float(l_sp), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        g_ref,
        g_sp,
    )


def test_sp_conditioned_logits_match_unsharded():
    """Mel + speaker conditioned SP == unsharded forward, with perturbed
    (trained-regime) params. Cond upsamples globally and time-shards with
    the same halo ring; the speaker embedding stays replicated."""
    from lb_wavenet_tpu.config import ArchConfig

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_mels=8, cond_channels=8,
        upsample_factors=(2, 4), n_speakers=3, speaker_embed_dim=8,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    params = jax.tree_util.tree_map(
        lambda a: a
        + 0.1 * jax.random.normal(jax.random.key(a.size % 997), a.shape),
        params,
    )
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    t = 128  # 32/shard >= halo 8
    x = jax.random.randint(jax.random.key(1), (B, t), 0, 256)
    frames = jax.random.normal(
        jax.random.key(2), (B, t // arch.hop_size, arch.n_mels)
    )
    spk = jnp.array([0, 2], jnp.int32)
    ref = jax.jit(
        lambda p, x, f, s: forward(
            p, arch, x, cond_frames=f, speaker_ids=s
        )
    )(params, x, frames, spk)
    sp = jax.jit(
        lambda p, x, f, s: sequence_parallel_logits(
            p, arch, x, mesh, cond_frames=f, speaker_ids=s
        )
    )(params, x, frames, spk)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_sp_rejects_short_chunks():
    """Chunks shorter than the halo cannot feed the neighbor exchange."""
    params, _, mesh = _setup()
    short = jax.random.randint(jax.random.key(3), (B, 32), 0, 256)  # 8/shard
    with pytest.raises(ValueError, match="halo"):
        sequence_parallel_logits(params, MICRO, short, mesh)
    uneven = jax.random.randint(jax.random.key(3), (B, 130), 0, 256)
    with pytest.raises(ValueError, match="divide"):
        sequence_parallel_logits(params, MICRO, uneven, mesh)


# ---- Trainer integration (TrainConfig.seq_parallel) ----


def test_sp_train_step_matches_windowed_step():
    """One config-driven SP step == one windowed step (same init, batch).

    window chosen so T = R-1+W is NOT divisible by the 4 time shards —
    exercising seq_batch_to_device's causally-inert zero padding.
    """
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import shard_params
    from lb_wavenet_tpu.train import (
        batch_to_device,
        init_state,
        make_sp_train_step,
        seq_batch_to_device,
        train_step,
    )

    window = 47  # T = 15 + 47 = 62 -> padded to 64; 16-sample chunks >= halo 15
    train = TrainConfig(
        batch_size=2, window_size=window, learning_rate=1e-3,
        mesh_data=4, seq_parallel=True,
    )
    corpus = synthetic_corpus(MICRO, window, n_files=2, file_len=300)
    batch = next(make_batches(corpus, train))

    mesh_sp = make_mesh(4, 1, devices=jax.devices()[:4])
    mesh_1 = make_mesh(1, 1, devices=jax.devices()[:1])

    s_sp = shard_params(init_state(jax.random.key(0), MICRO, train), mesh_sp)
    s_ref = shard_params(init_state(jax.random.key(0), MICRO, train), mesh_1)

    sp_step = make_sp_train_step(mesh_sp, MICRO, train)
    s_sp, loss_sp = sp_step(
        s_sp, seq_batch_to_device(batch, mesh_sp, window)
    )
    s_ref, loss_ref = train_step(
        s_ref, batch_to_device(batch, mesh_1, MICRO), MICRO, train
    )
    assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        s_sp.params,
        s_ref.params,
    )


def test_sp_run_training_end_to_end(tmp_path):
    from lb_wavenet_tpu.config import Config
    from lb_wavenet_tpu.data import synthetic_corpus
    from lb_wavenet_tpu.train import run_training

    cfg = Config.from_dict(
        {
            "arch": {
                "n_blocks": 2, "n_layers_per_block": 3,
                "residual_channels": 8, "skip_channels": 8,
                "gate_channels": 8, "compute_dtype": "float32",
            },
            "train": {
                "batch_size": 2, "window_size": 48, "n_steps": 3,
                "mesh_data": 4, "seq_parallel": True, "log_every": 1,
                "checkpoint_every": 3,
                "checkpoint_dir": str(tmp_path / "ckpt"),
            },
        }
    )
    corpus = synthetic_corpus(cfg.arch, 48, n_files=2, file_len=300)
    state = run_training(cfg, corpus=corpus)
    assert int(state.step) == 3


def test_sp_mel_train_step_matches_windowed_step():
    """Config-driven mel-conditioned SP step == windowed step (same init,
    batch, incl. the upsampler gradient)."""
    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import shard_params
    from lb_wavenet_tpu.train import (
        batch_to_device,
        init_state,
        make_sp_train_step,
        seq_batch_to_device,
        train_step,
    )

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_mels=8, cond_channels=8,
        upsample_factors=(2, 4), compute_dtype="float32",
    )
    window = 47  # T = 8 + 47 = 55 -> padded to 56; 14/shard >= halo 8
    train = TrainConfig(
        batch_size=2, window_size=window, learning_rate=1e-3,
        mesh_data=4, seq_parallel=True,
    )
    corpus = synthetic_corpus(arch, window, n_files=2, file_len=300)
    batch = next(make_batches(corpus, train, with_mel=True))

    mesh_sp = make_mesh(4, 1, devices=jax.devices()[:4])
    mesh_1 = make_mesh(1, 1, devices=jax.devices()[:1])
    s_sp = shard_params(init_state(jax.random.key(0), arch, train), mesh_sp)
    s_ref = shard_params(init_state(jax.random.key(0), arch, train), mesh_1)

    sp_step = make_sp_train_step(mesh_sp, arch, train)
    s_sp, loss_sp = sp_step(
        s_sp, seq_batch_to_device(batch, mesh_sp, window, arch=arch)
    )
    s_ref, loss_ref = train_step(
        s_ref, batch_to_device(batch, mesh_1, arch), arch, train
    )
    assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        s_sp.params,
        s_ref.params,
    )


def test_sp_mel_step_exact_with_padding_and_trained_biases():
    """Regression: the time-pad region used to be covered by zero FRAMES,
    whose upsampler projection bias bleeds into the REAL tail through the
    SAME conv window on trained params. Geometry chosen so the pad branch
    fires (frames cover 50 of 52 padded samples) and every bias perturbed."""
    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import shard_params
    from lb_wavenet_tpu.train import (
        batch_to_device,
        init_state,
        make_sp_train_step,
        seq_batch_to_device,
        train_step,
    )

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_mels=8, cond_channels=8,
        upsample_factors=(2,), compute_dtype="float32",
    )
    window = 41  # T = 8 + 41 = 49 -> tp = 52 > frame coverage 50: pad fires
    train = TrainConfig(batch_size=2, window_size=window, learning_rate=1e-3,
                        mesh_data=4, seq_parallel=True)
    corpus = synthetic_corpus(arch, window, n_files=2, file_len=300)
    batch = next(make_batches(corpus, train, with_mel=True))

    mesh_sp = make_mesh(4, 1, devices=jax.devices()[:4])
    mesh_1 = make_mesh(1, 1, devices=jax.devices()[:1])

    def perturbed(state):
        return state._replace(params=jax.tree_util.tree_map(
            lambda a: a
            + 0.1 * jax.random.normal(jax.random.key(a.size % 997), a.shape),
            state.params,
        ))

    s_sp = shard_params(
        perturbed(init_state(jax.random.key(0), arch, train)), mesh_sp
    )
    s_ref = shard_params(
        perturbed(init_state(jax.random.key(0), arch, train)), mesh_1
    )
    sp_step = make_sp_train_step(mesh_sp, arch, train)
    s_sp, loss_sp = sp_step(
        s_sp, seq_batch_to_device(batch, mesh_sp, window, arch=arch)
    )
    s_ref, loss_ref = train_step(
        s_ref, batch_to_device(batch, mesh_1, arch), arch, train
    )
    assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5), (
        float(loss_sp), float(loss_ref),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        s_sp.params,
        s_ref.params,
    )


def test_sp_fused_stack_logits_and_grads_match_xla():
    """VERDICT r1 item 3: the fused Pallas kernel (with its in-kernel halo
    mask) runs per time shard — logits AND grads match the XLA SP path on
    nonzero (trained-regime) biases, with and without tapcat."""
    from lb_wavenet_tpu.parallel.halo import sequence_parallel_loss

    params, x, mesh = _setup()
    params = jax.tree_util.tree_map(
        lambda a: a
        + 0.1 * jax.random.normal(jax.random.key(a.size % 997), a.shape),
        params,
    )
    ref = jax.jit(lambda p, x: forward(p, MICRO, x))(params, x)
    for tapcat in (False, True):
        sp = jax.jit(
            lambda p, x: sequence_parallel_logits(
                p, MICRO, x, mesh, fused_stack=True, tapcat=tapcat
            )
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    tgt = jax.random.randint(jax.random.key(2), x.shape, 0, 256)
    msk = np.ones(x.shape, np.float32)

    def lf(p, fused):
        return sequence_parallel_loss(
            p, MICRO, x, tgt, msk, mesh, fused_stack=fused
        )

    l_x, g_x = jax.jit(jax.value_and_grad(lambda p: lf(p, False)))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(lambda p: lf(p, True)))(params)
    np.testing.assert_allclose(float(l_x), float(l_f), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        g_x,
        g_f,
    )


def test_sp_fused_train_step_matches_windowed_fused_step():
    """SP + fused_stack + tapcat == one windowed fused step (same init/batch)."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import shard_params
    from lb_wavenet_tpu.train import (
        batch_to_device,
        init_state,
        make_sp_train_step,
        seq_batch_to_device,
        train_step,
    )

    window = 49  # T = 15 + 49 = 64; 16-sample chunks >= halo 15
    train = TrainConfig(
        batch_size=2, window_size=window, learning_rate=1e-3,
        mesh_data=4, seq_parallel=True, fused_stack=True, tapcat=True,
    )
    corpus = synthetic_corpus(MICRO, window, n_files=2, file_len=300)
    batch = next(make_batches(corpus, train))

    mesh_sp = make_mesh(4, 1, devices=jax.devices()[:4])
    mesh_1 = make_mesh(1, 1, devices=jax.devices()[:1])

    s_sp = shard_params(init_state(jax.random.key(0), MICRO, train), mesh_sp)
    s_ref = shard_params(init_state(jax.random.key(0), MICRO, train), mesh_1)

    sp_step = make_sp_train_step(mesh_sp, MICRO, train)
    s_sp, loss_sp = sp_step(
        s_sp, seq_batch_to_device(batch, mesh_sp, window)
    )
    s_ref, loss_ref = train_step(
        s_ref, batch_to_device(batch, mesh_1, MICRO), MICRO, train
    )
    assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        s_sp.params,
        s_ref.params,
    )


def test_sp_grad_accum_matches_one_shot():
    """SP grad_accum (batch-row microbatches over sharded time) == the
    unaccumulated SP step: same loss, same updated params."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus
    from lb_wavenet_tpu.parallel.mesh import shard_params
    from lb_wavenet_tpu.train import (
        init_state, make_sp_train_step, seq_batch_to_device,
    )

    window = 49
    kw = dict(batch_size=4, window_size=window, learning_rate=1e-3,
              mesh_data=4, seq_parallel=True, fused_stack=True)
    train_1 = TrainConfig(**kw)
    train_k = TrainConfig(grad_accum=2, **kw)
    corpus = synthetic_corpus(MICRO, window, n_files=2, file_len=400)
    batch = next(make_batches(corpus, train_1))

    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    s_1 = shard_params(init_state(jax.random.key(0), MICRO, train_1), mesh)
    s_k = shard_params(init_state(jax.random.key(0), MICRO, train_k), mesh)

    dev_batch = seq_batch_to_device(batch, mesh, window)
    s_1, loss_1 = make_sp_train_step(mesh, MICRO, train_1)(s_1, dev_batch)
    dev_batch = seq_batch_to_device(batch, mesh, window)
    s_k, loss_k = make_sp_train_step(mesh, MICRO, train_k)(s_k, dev_batch)

    np.testing.assert_allclose(float(loss_1), float(loss_k), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        s_1.params,
        s_k.params,
    )


def test_sp_run_training_fused_accum_end_to_end(tmp_path):
    """Production-speed SP through run_training: seq_parallel + fused_stack
    + tapcat + grad_accum trains and the loss stays finite/decreasing."""
    from lb_wavenet_tpu.config import Config
    from lb_wavenet_tpu.data import synthetic_corpus
    from lb_wavenet_tpu.train import run_training

    cfg = Config.from_dict(
        {
            "arch": {
                "n_blocks": 1, "n_layers_per_block": 3,
                "residual_channels": 8, "skip_channels": 8,
                "gate_channels": 8, "compute_dtype": "float32",
            },
            "train": {
                "batch_size": 4, "window_size": 41, "n_steps": 3,
                "mesh_data": 4, "seq_parallel": True, "fused_stack": True,
                "tapcat": True, "grad_accum": 2, "learning_rate": 1e-3,
                "checkpoint_dir": str(tmp_path / "ckpt"),
            },
        }
    )
    corpus = synthetic_corpus(cfg.arch, 41, n_files=2, file_len=300)
    state = run_training(cfg, corpus=corpus)
    assert int(state.step) == 3


def test_sp_fused_frontend_matches_unsharded():
    """fused_frontend in the SP path: the frontend kernel's in-kernel input
    mask reproduces the halo zeroing — logits and grads match the
    unsharded forward (MICRO is f32-compute, so parity is tight)."""
    from lb_wavenet_tpu.parallel.halo import (
        sequence_parallel_logits, sequence_parallel_loss,
    )

    params, x, mesh = _setup()
    ref = jax.jit(lambda p, x: forward(p, MICRO, x))(params, x)
    sp = jax.jit(
        lambda p, x: sequence_parallel_logits(
            p, MICRO, x, mesh, fused_stack=True, tapcat=True,
            fused_frontend=True,
        )
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    tgt = jax.random.randint(jax.random.key(2), x.shape, 0, 256)
    msk = np.ones(x.shape, np.float32)

    def lf(p, ff):
        return sequence_parallel_loss(
            p, MICRO, x, tgt, msk, mesh, fused_stack=True, tapcat=True,
            fused_frontend=ff,
        )

    l_x, g_x = jax.jit(jax.value_and_grad(lambda p: lf(p, False)))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(lambda p: lf(p, True)))(params)
    np.testing.assert_allclose(float(l_x), float(l_f), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        g_x,
        g_f,
    )
