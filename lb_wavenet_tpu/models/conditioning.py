"""Local (mel) and global conditioning frontends.

Reference parity: the reference upsamples frame-rate local-conditioning
features (mel spectrograms) to sample rate with a learned upsampling stack and
injects a per-layer projection of them into every gate; global conditioning is
a speaker embedding broadcast over time (SURVEY.md §2.1 "Local-conditioning
frontend", "Global conditioning"; BASELINE.json config 3).

TPU-first realization: each stage of the upsampler is nearest-neighbor repeat
by its factor followed by a learned SAME smoothing conv (one stage per factor
in `arch.upsample_factors`, product == hop size). Repeat+conv keeps output
length exactly `f * input` with no transposed-conv padding arithmetic, and
lowers to MXU matmuls. The whole stack is feed-forward and computed once per
utterance for both training and synthesis — it sits outside the
autoregressive loop, so the sampler's `lax.scan` only ever consumes a
precomputed (B, T, cond) array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ArchConfig


def init_upsampler_params(rng, arch: ArchConfig) -> dict:
    cc = arch.cond_channels
    keys = jax.random.split(rng, len(arch.upsample_factors) + 1)
    params = {
        "proj_w": jax.random.normal(keys[0], (arch.n_mels, cc))
        / jnp.sqrt(float(arch.n_mels)),
        "proj_b": jnp.zeros((cc,)),
        "stages": [],
    }
    for i, f in enumerate(arch.upsample_factors):
        k = 2 * f + 1  # smoothing kernel spans ± one original frame
        params["stages"].append(
            {
                # conv kernel layout (spatial, in, out) for dn ("NHC","HIO","NHC")
                "w": jax.random.normal(keys[i + 1], (k, cc, cc))
                / jnp.sqrt(float(k * cc)),
                "b": jnp.zeros((cc,)),
            }
        )
    return params


def upsample_cond(
    params: dict, arch: ArchConfig, frames: jnp.ndarray, dtype
) -> jnp.ndarray:
    """(B, F, n_mels) frame features -> (B, F * hop, cond_channels).

    Computed in fp32 regardless of `dtype`: the stack is tiny and runs ONCE
    per utterance (outside the AR loop / per train step), and
    lax.conv_general_dilated's gradient rule rejects mixed dtypes — bf16
    inputs with the fp32 cotangent produced by preferred_element_type broke
    `grad` through bf16-arch mel training. Only the OUTPUT is cast to
    `dtype` (halves the per-step conditioning stream the sampler reads).
    """
    h = (
        jax.lax.dot_general(
            frames.astype(jnp.float32),
            params["proj_w"].astype(jnp.float32),
            (((2,), (0,)), ((), ())),
        )
        + params["proj_b"]
    )
    for f, stage in zip(arch.upsample_factors, params["stages"]):
        h = jnp.repeat(h, f, axis=1)  # nearest-neighbor upsample by f
        out = jax.lax.conv_general_dilated(
            h,
            stage["w"].astype(jnp.float32),
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        h = jax.nn.leaky_relu(out + stage["b"], negative_slope=0.4)
    return h.astype(dtype)
