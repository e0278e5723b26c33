"""Mu-law companding codec.

Reference parity: the reference quantizes waveforms to 256 mu-law classes for
its categorical softmax output and decodes generated class sequences back to
float waveforms (SURVEY.md §2.1 "mu-law codec"; BASELINE.json north-star
requires bit-matching mu-law sample parity). The formulas are the standard
ITU-T G.711 / WaveNet-paper (arXiv 1609.03499 §2.2) equations:

    f(x)  = sign(x) * ln(1 + mu*|x|) / ln(1 + mu)          (encode, to [-1, 1])
    f^-1(y) = sign(y) * ((1 + mu)^|y| - 1) / mu            (decode)

with mu = Q - 1 = 255 and uniform quantization of f(x) into Q classes.

All functions are pure jnp, shape-polymorphic, and jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def mu_law_encode(x: jnp.ndarray, quant_channels: int = 256) -> jnp.ndarray:
    """Float waveform in [-1, 1] -> integer classes in [0, quant_channels).

    Uses the mid-rise uniform quantizer of the companded signal:
    class = floor((f(x) + 1) / 2 * (Q - 1) + 0.5), matching the common
    WaveNet-era TF implementation semantics (round-half-up on the companded
    value), so class Q//2 - 1 .. Q//2 straddle zero.
    """
    mu = quant_channels - 1
    x = jnp.clip(x, -1.0, 1.0)
    companded = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    return jnp.clip(
        jnp.floor((companded + 1.0) / 2.0 * mu + 0.5), 0, mu
    ).astype(jnp.int32)


def mu_law_decode(y: jnp.ndarray, quant_channels: int = 256) -> jnp.ndarray:
    """Integer classes in [0, quant_channels) -> float waveform in [-1, 1]."""
    mu = quant_channels - 1
    companded = 2.0 * y.astype(jnp.float32) / mu - 1.0
    return (
        jnp.sign(companded)
        * (jnp.power(1.0 + mu, jnp.abs(companded)) - 1.0)
        / mu
    )
