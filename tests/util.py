"""Shared test fixtures: micro/tiny archs and jitted forwards.

The CI box is 2-core CPU; eager per-op dispatch is the dominant cost, so
tests jit whole forwards and reuse shapes/configs aggressively.
"""
import functools

import jax

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.models.wavenet import forward

# BASELINE.json config 1: tiny 2x5 / 32ch — used by the parity tiers.
TINY = ArchConfig(
    n_blocks=2,
    n_layers_per_block=5,
    residual_channels=32,
    skip_channels=32,
    gate_channels=32,
    compute_dtype="float32",
)

# Even smaller arch for structural tests (receptive field 1+1+7*2=16).
MICRO = ArchConfig(
    n_blocks=2,
    n_layers_per_block=3,
    residual_channels=8,
    skip_channels=8,
    gate_channels=8,
    compute_dtype="float32",
)


_jitted = {}


def fwd(params, arch, x, **kw):
    """Jitted forward, one compile per (arch, shape)."""
    if arch not in _jitted:
        _jitted[arch] = jax.jit(
            lambda p, xx, cond=None, spk=None: forward(
                p, arch, xx, cond_frames=cond, speaker_ids=spk
            )
        )
    return _jitted[arch](params, x, **kw)
