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
