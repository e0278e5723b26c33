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


def cond_halo_frames(arch: ArchConfig) -> int:
    """Frames of context (each side) after which chunked upsampling is exact.

    Each stage is repeat-by-f then a SAME conv of kernel 2f+1: stage s's
    output depends on ±1 frame at its INPUT rate, i.e. ±1/(f_1···f_{s-1})
    original frames. The total radius is 1 + 1/f_1 + 1/(f_1 f_2) + ... < 2,
    so ceil of the sum (typically 2) frames of halo make an interior chunk
    equal the one-shot output; at true sequence boundaries the SAME-conv
    zero padding itself reproduces the one-shot edge behavior.
    """
    import math

    r, p = 0.0, 1
    for f in arch.upsample_factors:
        r += 1.0 / p
        p *= f
    return int(math.ceil(r))


class StreamingUpsampler:
    """Incremental frame-rate mel -> sample-rate conditioning.

    The streaming-TTS frontend of the vocoder serving path: feed mel frame
    chunks with `feed`, get back the conditioning samples that became FINAL
    (have `cond_halo_frames` of lookahead); `finish` flushes the tail with
    true end-of-sequence semantics. The concatenated output is bit-identical
    to slicing one `upsample_cond` call over all frames
    (tests/test_mel_pipeline.py), at a fixed latency of `cond_halo_frames`
    frames (= halo * hop_size samples).
    """

    def __init__(self, params: dict, arch: ArchConfig, dtype=jnp.float32):
        self.arch = arch
        self.pad = cond_halo_frames(arch)
        self._up = jax.jit(
            lambda fr: upsample_cond(params, arch, fr, dtype)
        )
        self._buf = None   # (B, n, n_mels): left halo + not-yet-final frames
        self._left = 0     # halo frames at the buffer head (already emitted)
        self._done = False

    def _empty(self):
        b = 1 if self._buf is None else self._buf.shape[0]
        return jnp.zeros((b, 0, self.arch.cond_channels))

    def _emit(self, n_frames: int) -> jnp.ndarray:
        h = self._up(self._buf)
        hop = self.arch.hop_size
        out = h[:, self._left * hop : (self._left + n_frames) * hop]
        keep_from = max(self._left + n_frames - self.pad, 0)
        self._buf = self._buf[:, keep_from:]
        self._left = self._left + n_frames - keep_from
        return out

    def feed(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Add (B, F, n_mels) frames; return newly-final cond samples
        (B, S, cond_channels) — possibly S == 0 while lookahead builds."""
        if self._done:
            raise ValueError("StreamingUpsampler already finished")
        frames = jnp.asarray(frames)
        self._buf = (
            frames
            if self._buf is None
            else jnp.concatenate([self._buf, frames], axis=1)
        )
        emit = self._buf.shape[1] - self._left - self.pad
        if emit <= 0:
            return self._empty()
        return self._emit(emit)

    def finish(self) -> jnp.ndarray:
        """Flush: the remaining frames are final (true sequence end)."""
        if self._done:
            raise ValueError("StreamingUpsampler already finished")
        self._done = True
        if self._buf is None:
            return self._empty()
        emit = self._buf.shape[1] - self._left
        if emit <= 0:
            return self._empty()
        return self._emit(emit)
