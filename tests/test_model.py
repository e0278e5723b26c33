"""Model tier (SURVEY.md §4): forward shapes, causality, loss masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.models.wavenet import init_params, masked_loss

from .util import MICRO, TINY, fwd


@pytest.fixture(scope="module")
def micro_model():
    return init_params(jax.random.key(0), MICRO)


def test_forward_shape_tiny():
    params = init_params(jax.random.key(0), TINY)
    x = jax.random.randint(jax.random.key(1), (2, 96), 0, 256)
    logits = fwd(params, TINY, x)
    assert logits.shape == (2, 96, 256)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality_and_receptive_field(micro_model):
    """logits[:, t] depends on x[:, t-R+1 : t+1] and nothing else."""
    r = MICRO.receptive_field  # 16
    t = 40
    x = jax.random.randint(jax.random.key(2), (1, 64), 0, 256)
    base = fwd(micro_model, MICRO, x)

    # Perturb at t: nothing strictly before t changes.
    x_future = x.at[0, t].set((x[0, t] + 13) % 256)
    out = fwd(micro_model, MICRO, x_future)
    diff = np.abs(np.asarray(base - out)).sum(axis=-1)[0]
    assert (diff[:t] == 0).all(), "future leaked into the past"
    assert diff[t:].max() > 0

    # Perturb at t - (R-1): logit t still sees it; at t - R: it does not.
    base_t = np.asarray(base[0, t])
    x_in = x.at[0, t - (r - 1)].set((x[0, t - (r - 1)] + 7) % 256)
    x_out = x.at[0, t - r].set((x[0, t - r] + 7) % 256)
    d_in = np.abs(np.asarray(fwd(micro_model, MICRO, x_in)[0, t]) - base_t).max()
    d_out = np.abs(np.asarray(fwd(micro_model, MICRO, x_out)[0, t]) - base_t).max()
    assert d_in > 0
    assert d_out == 0


def test_masked_loss_ignores_masked_positions(micro_model):
    w = 16
    t = MICRO.receptive_field - 1 + w
    x = jax.random.randint(jax.random.key(4), (2, t), 0, 256)
    logits = fwd(micro_model, MICRO, x)
    targets = jax.random.randint(jax.random.key(5), (2, w), 0, 256)
    mask = jnp.ones((2, w))
    full = masked_loss(logits, targets, mask, w)
    # Corrupt targets only at masked positions: loss unchanged.
    mask2 = mask.at[:, :5].set(0.0)
    t_bad = targets.at[:, :5].set(0)
    l_a = masked_loss(logits, targets, mask2, w)
    l_b = masked_loss(logits, t_bad, mask2, w)
    assert jnp.allclose(l_a, l_b)
    assert not jnp.allclose(full, l_a)
    assert float(full) > 0


def test_conditioned_forward_shapes():
    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4, 4),
        n_speakers=5,
        speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    t = 64  # = 4 frames * hop 16
    x = jax.random.randint(jax.random.key(1), (2, t), 0, 256)
    frames = jax.random.normal(jax.random.key(2), (2, 4, 8))
    spk = jnp.asarray([0, 3])
    logits = fwd(params, arch, x, cond=frames, spk=spk)
    assert logits.shape == (2, t, 256)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_invariant_across_randomized_archs():
    """Fast-WaveNet train-forward == incremental-scan invariant, swept over
    randomized tiny architectures (dilation patterns, input kernel widths,
    channel shapes) — not just the fixed MICRO config."""
    import numpy as np

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import forward, init_params

    rng = np.random.default_rng(123)
    for trial in range(4):
        arch = ArchConfig(
            n_blocks=int(rng.integers(1, 3)),
            n_layers_per_block=int(rng.integers(2, 5)),
            residual_channels=int(rng.choice([4, 8, 16])),
            skip_channels=int(rng.choice([4, 8, 16])),
            gate_channels=int(rng.choice([4, 8])),
            input_kernel=int(rng.choice([2, 3])),
            # Non-default mu-law depths must work end to end too.
            quant_channels=int(rng.choice([64, 128, 256])),
            compute_dtype="float32",
        )
        params = init_params(jax.random.key(trial), arch)
        b, t = 2, 12
        forced = jax.numpy.asarray(
            rng.integers(0, arch.quant_channels, (b, t)), jax.numpy.int32
        )
        # Teacher-forced scan logits at step s consume classes [0..s] with
        # zero-class left padding — exactly forward() on the same prefix.
        _, scan_logits = generate_classes(
            params, arch, jax.random.key(trial + 100), b, t,
            forced=forced, return_logits=True,
        )
        zero = jax.numpy.full((b, 1), arch.quant_channels // 2,
                              jax.numpy.int32)
        x = jax.numpy.concatenate([zero, forced[:, :-1]], axis=1)
        fwd_logits = jax.jit(
            lambda p, y, a=arch: forward(p, a, y)
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(scan_logits), np.asarray(fwd_logits),
            rtol=2e-5, atol=2e-5,
            err_msg=f"trial {trial}: arch={arch.dilations}, "
                    f"K={arch.input_kernel}",
        )
