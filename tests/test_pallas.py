"""Kernel-parity tier (SURVEY.md §4): Pallas fused AR step == XLA reference
path, via pallas_call(interpret=True) on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import generate_classes
from lb_wavenet_tpu.models.wavenet import init_params

from .util import MICRO

B, T = 2, 20


def test_pallas_engine_matches_xla_engine():
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(1)
    ref_cls, ref_logits = generate_classes(
        params, MICRO, rng, B, T, return_logits=True
    )
    pal_cls, pal_logits = generate_classes(
        params, MICRO, rng, B, T, return_logits=True, use_pallas=True
    )
    np.testing.assert_allclose(
        np.asarray(pal_logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(pal_cls), np.asarray(ref_cls))


def test_pallas_engine_conditioned():
    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4,),
        n_speakers=4,
        speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    frames = jax.random.normal(jax.random.key(1), (B, 5, 8))
    cond = upsample_cond(params["upsampler"], arch, frames, jnp.float32)
    spk = jnp.asarray([1, 3])
    rng = jax.random.key(2)
    ref_cls, ref_logits = generate_classes(
        params, arch, rng, B, T, cond=cond, speaker_ids=spk, return_logits=True
    )
    pal_cls, pal_logits = generate_classes(
        params,
        arch,
        rng,
        B,
        T,
        cond=cond,
        speaker_ids=spk,
        return_logits=True,
        use_pallas=True,
    )
    np.testing.assert_allclose(
        np.asarray(pal_logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(pal_cls), np.asarray(ref_cls))


def test_turbo_engine_greedy_matches_xla():
    """Deterministic (temperature=0) turbo path == XLA engine, incl. priming."""
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(5)
    # Prime the first 8 samples with a fixed pattern, then free-run greedily.
    forced = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (B, 8), 0, 256),
            jnp.full((B, T - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    ref = generate_classes(
        params, MICRO, rng, B, T, forced=forced, temperature=0.0, engine="xla"
    )
    turbo = generate_classes(
        params, MICRO, rng, B, T, forced=forced, temperature=0.0, engine="turbo"
    )
    np.testing.assert_array_equal(np.asarray(turbo), np.asarray(ref))


def test_turbo_engine_conditioned_greedy():
    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4,),
        n_speakers=4,
        speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    frames = jax.random.normal(jax.random.key(1), (B, 5, 8))
    cond = upsample_cond(params["upsampler"], arch, frames, jnp.float32)
    spk = jnp.asarray([1, 3])
    rng = jax.random.key(2)
    ref = generate_classes(
        params, arch, rng, B, T, cond=cond, speaker_ids=spk, temperature=0.0,
        engine="xla",
    )
    turbo = generate_classes(
        params, arch, rng, B, T, cond=cond, speaker_ids=spk, temperature=0.0,
        engine="turbo",
    )
    np.testing.assert_array_equal(np.asarray(turbo), np.asarray(ref))


def test_turbo_sampling_runs():
    """Stochastic turbo path: runs, in-range, deterministic per seed."""
    params = init_params(jax.random.key(0), MICRO)
    a = generate_classes(params, MICRO, jax.random.key(7), B, T, engine="turbo")
    b2 = generate_classes(params, MICRO, jax.random.key(7), B, T, engine="turbo")
    c = generate_classes(params, MICRO, jax.random.key(8), B, T, engine="turbo")
    a, b2, c = map(np.asarray, (a, b2, c))
    assert a.min() >= 0 and a.max() < 256
    np.testing.assert_array_equal(a, b2)  # same seed -> same stream
    assert (a != c).any()                 # different seed -> different stream


def test_mega_engine_greedy_matches_xla():
    """Mega kernel (whole loop in one pallas_call): greedy + primed == XLA."""
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(5)
    forced = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (B, 8), 0, 256),
            jnp.full((B, T - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    ref = generate_classes(
        params, MICRO, rng, B, T, forced=forced, temperature=0.0, engine="xla"
    )
    mega = generate_classes(
        params, MICRO, rng, B, T, forced=forced, temperature=0.0, engine="mega"
    )
    np.testing.assert_array_equal(np.asarray(mega), np.asarray(ref))


def test_mega_engine_conditioned_greedy():
    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4,),
        n_speakers=4,
        speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    frames = jax.random.normal(jax.random.key(1), (B, 5, 8))
    cond = upsample_cond(params["upsampler"], arch, frames, jnp.float32)
    spk = jnp.asarray([1, 3])
    rng = jax.random.key(2)
    ref = generate_classes(
        params, arch, rng, B, T, cond=cond, speaker_ids=spk, temperature=0.0,
        engine="xla",
    )
    mega = generate_classes(
        params, arch, rng, B, T, cond=cond, speaker_ids=spk, temperature=0.0,
        engine="mega",
    )
    np.testing.assert_array_equal(np.asarray(mega), np.asarray(ref))


def test_mega_teacher_forced_logits_match_xla():
    """State-machine correctness without AR feedback amplification: fully
    teacher-forced mega logits == XLA engine logits."""
    params = init_params(jax.random.key(0), MICRO)
    forced = jax.random.randint(jax.random.key(9), (B, T), 0, 256)
    rng = jax.random.key(10)
    _, ref_logits = generate_classes(
        params, MICRO, rng, B, T, forced=forced, return_logits=True,
        engine="xla",
    )
    _, mega_logits = generate_classes(
        params, MICRO, rng, B, T, forced=forced, return_logits=True,
        engine="mega", temperature=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(mega_logits), np.asarray(ref_logits), rtol=2e-5, atol=2e-5
    )


def test_mega_engine_pads_odd_batch(monkeypatch):
    """mega pads the batch to the kernel's lane multiple and slices back;
    greedy output for the real lanes matches the XLA engine."""
    monkeypatch.setenv("WAVENET_MEGA_PAD_TEST", "4")
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(5)
    b_odd = 3
    forced = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (b_odd, 8), 0, 256),
            jnp.full((b_odd, T - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    ref = generate_classes(
        params, MICRO, rng, b_odd, T, forced=forced, temperature=0.0,
        engine="xla",
    )
    mega = generate_classes(
        params, MICRO, rng, b_odd, T, forced=forced, temperature=0.0,
        engine="mega",
    )
    assert mega.shape == (b_odd, T)
    np.testing.assert_array_equal(np.asarray(mega), np.asarray(ref))


def test_mega_engine_vmem_rings(monkeypatch):
    """WAVENET_MEGA_VMEM_D: small-dilation rings resident in VMEM scratch
    (no DMA) — must match the XLA engine exactly like the default path."""
    monkeypatch.setenv("WAVENET_MEGA_VMEM_D", "4")
    # Same (batch, n_samples) as the default-path tests above: the knob is
    # read outside jit and threaded as a static arg, so the flip must
    # RETRACE rather than hit the cached default-path executable.
    t2 = T
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(5)
    forced = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (B, 8), 0, 256),
            jnp.full((B, t2 - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    ref = generate_classes(
        params, MICRO, rng, B, t2, forced=forced, temperature=0.0, engine="xla"
    )
    mega = generate_classes(
        params, MICRO, rng, B, t2, forced=forced, temperature=0.0, engine="mega"
    )
    np.testing.assert_array_equal(np.asarray(mega), np.asarray(ref))
