"""TPU-native WaveNet model: parameters + teacher-forced forward pass.

Reference parity: implements the reference's model surface (SURVEY.md §2.1,
§3.3) — causal input conv, B×L dilated causal convs with gated tanh/sigmoid
units, 1×1 residual and skip projections, ReLU post-network, 256-way mu-law
softmax head, optional local (mel) and global (speaker) conditioning injected
into every gate — but designed TPU-first rather than ported:

  * No conv primitives: a width-2 dilated causal conv is two matmuls on the
    current and d-shifted activations. Matmuls are what the MXU runs at
    speed-of-light, and the shift is a free pad/slice that XLA folds away.
  * Per-layer weights are STACKED along a leading layer axis (every layer has
    identical shapes; only the dilation differs). One pytree of a few large
    arrays instead of L small ones: friendlier to GSPMD sharding, to orbax,
    and to Pallas BlockSpec indexing.
  * Parameters are a plain dict pytree (no framework Module), so the training
    forward, the ring-buffer lax.scan sampler, and the Pallas kernels all
    consume the identical arrays — the Fast-WaveNet train≡incremental
    invariant is then a property of code, not of weight-translation glue.
  * bfloat16 compute / float32 params & accumulation by default.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ArchConfig


Params = dict


def _dense_init(key, shape, dtype=jnp.float32):
    """LeCun-normal (std = 1/sqrt(fan_in)), the classic conv/dense init."""
    fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    return jax.random.normal(key, shape, dtype) / jnp.sqrt(float(fan_in))


def init_params(rng: jax.Array, arch: ArchConfig) -> Params:
    """Create the parameter pytree for `forward` / the generation engines."""
    L = len(arch.dilations)
    C = arch.residual_channels
    G = arch.gate_channels
    S = arch.skip_channels
    Q = arch.quant_channels
    K = arch.input_kernel

    keys = iter(jax.random.split(rng, 16))
    params: Params = {
        # Input: class embedding (== one-hot @ W) + width-K causal conv.
        "embed": _dense_init(next(keys), (Q, C)),
        "input_conv": {
            "w": _dense_init(next(keys), (K, C, C)),  # taps t-(K-1) .. t
            "b": jnp.zeros((C,)),
        },
        "layers": {
            "w_prev": _dense_init(next(keys), (L, C, 2 * G)),  # tap at t - d
            "w_cur": _dense_init(next(keys), (L, C, 2 * G)),   # tap at t
            "b": jnp.zeros((L, 2 * G)),
            "w_res": _dense_init(next(keys), (L, G, C)),
            "b_res": jnp.zeros((L, C)),
            "w_skip": _dense_init(next(keys), (L, G, S)),
            "b_skip": jnp.zeros((L, S)),
        },
        "post": {
            "w1": _dense_init(next(keys), (S, S)),
            "b1": jnp.zeros((S,)),
            "w2": _dense_init(next(keys), (S, Q)),
            "b2": jnp.zeros((Q,)),
        },
    }
    if arch.use_local_cond:
        params["layers"]["w_cond"] = _dense_init(
            next(keys), (L, arch.cond_channels, 2 * G)
        )
        from .conditioning import init_upsampler_params  # local import, no cycle

        params["upsampler"] = init_upsampler_params(next(keys), arch)
    if arch.use_global_cond:
        params["speaker_embed"] = _dense_init(
            next(keys), (arch.n_speakers, arch.speaker_embed_dim)
        )
        params["layers"]["w_gcond"] = _dense_init(
            next(keys), (L, arch.speaker_embed_dim, 2 * G)
        )
    return params


@jax.custom_vjp
def embed_lookup_mm(embed: jnp.ndarray, x_classes: jnp.ndarray):
    """embed[x_classes] with a matmul-based backward.

    The gather's standard VJP is a scatter-add, which serializes on TPU;
    here the cotangent is contracted against a BLOCKED one-hot instead —
    pure MXU work, measured 1.65 vs 1.98 ms for the full frontend-grad
    microprogram at B=8/T=9214 (scripts/frontend_ab.py). The contraction
    runs at HIGHEST precision: one-hot entries are exact 0/1, so the
    result matches the scatter to f32 rounding. Opt-in via
    TrainConfig.mm_embed_grad (production configs)."""
    return embed[x_classes]


def _embed_lookup_mm_fwd(embed, x_classes):
    return embed[x_classes], (x_classes, embed.shape)


def _embed_lookup_mm_bwd(res, g):
    x_classes, (q, c) = res
    b, t = x_classes.shape
    chunk = min(2048, t)
    t_pad = -(-t // chunk) * chunk
    # Pad with class index q: matches no one-hot column -> contributes 0.
    xp = jnp.pad(x_classes, ((0, 0), (0, t_pad - t)), constant_values=q)
    gp = jnp.pad(g, ((0, 0), (0, t_pad - t), (0, 0)))
    xc = jnp.moveaxis(xp.reshape(b, t_pad // chunk, chunk), 1, 0)
    gc = jnp.moveaxis(gp.reshape(b, t_pad // chunk, chunk, c), 1, 0)

    def body(acc, inp):
        xi, gi = inp
        onehot = (
            xi.reshape(-1)[:, None] == jnp.arange(q)[None, :]
        ).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot, gi.reshape(-1, c).astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ), None

    acc, _ = jax.lax.scan(body, jnp.zeros((q, c), jnp.float32), (xc, gc))
    return acc, np.zeros(x_classes.shape, jax.dtypes.float0)


embed_lookup_mm.defvjp(_embed_lookup_mm_fwd, _embed_lookup_mm_bwd)


def shift_right(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """y[:, t] = x[:, t - d] with zeros for t < d. Shapes (B, T, C)."""
    if d == 0:
        return x
    t = x.shape[1]
    return jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :t]


def _mm(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """(..., C) @ (C, D) in compute dtype with fp32 MXU accumulation."""
    return jax.lax.dot_general(
        x.astype(dtype),
        w.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def gated_unit(
    x: jnp.ndarray,
    x_prev: jnp.ndarray,
    layer_params: Params,
    i: int,
    dtype,
    cond: Optional[jnp.ndarray] = None,
    gcond: Optional[jnp.ndarray] = None,
):
    """Gated activation + residual update; returns (residual_out, z).

    The skip contribution is z @ w_skip[i] + b_skip[i]; `forward` computes
    ALL layers' skip contributions as one stacked einsum (see there), so the
    unit returns z rather than the projected skip.
    """
    lp = layer_params
    pre = (
        _mm(x, lp["w_cur"][i], dtype)
        + _mm(x_prev, lp["w_prev"][i], dtype)
        + lp["b"][i]
    )
    if cond is not None:
        pre = pre + _mm(cond, lp["w_cond"][i], dtype)
    if gcond is not None:
        pre = pre + _mm(gcond, lp["w_gcond"][i], dtype)
    g = lp["w_cur"].shape[-1] // 2
    z = jnp.tanh(pre[..., :g]) * jax.nn.sigmoid(pre[..., g:])
    res = x + _mm(z, lp["w_res"][i], dtype) + lp["b_res"][i]
    return res, z


def gated_layer(
    x: jnp.ndarray,
    x_prev: jnp.ndarray,
    layer_params: Params,
    i: int,
    dtype,
    cond: Optional[jnp.ndarray] = None,
    gcond: Optional[jnp.ndarray] = None,
):
    """One gated residual unit given current and d-shifted activations.

    Returns (residual_out, skip_contribution). This exact function body is
    the contract the incremental engines replicate step-wise.
    """
    lp = layer_params
    res, z = gated_unit(x, x_prev, layer_params, i, dtype, cond, gcond)
    skip = _mm(z, lp["w_skip"][i], dtype) + lp["b_skip"][i]
    return res, skip


def input_frontend(
    params: Params,
    arch: ArchConfig,
    x_classes: jnp.ndarray,
    dtype,
    input_mask: Optional[jnp.ndarray] = None,
    mm_embed_grad: bool = False,
    fused_frontend: bool = False,
) -> jnp.ndarray:
    """Embed classes and apply the width-K causal input conv. (B,T) -> (B,T,C).

    `input_mask` (B, T) makes masked positions contribute exactly like the
    pre-sequence zero padding — the hook sequence-parallel halo exchange
    uses to realize "no history" on the first shard (parallel/halo.py).
    Zeroing the embeddings alone is NOT enough: with nonzero biases a
    masked row's activation would be the bias-propagated value, while the
    unsharded forward's shift_right pads ACTIVATION zeros — so the frontend
    output is re-masked here and forward() re-masks the residual stream
    after every layer.

    fused_frontend routes the whole thing (fwd + grads) through the Pallas
    kernel pair in ops/pallas/frontend.py — bit-exact for bf16 compute,
    subsumes mm_embed_grad (TrainConfig.fused_frontend).

    CONTRACT: the mask is STRUCTURAL (halo/boundary exclusion, data-derived)
    and non-differentiable — enforced with stop_gradient here so the XLA
    path can never silently diverge from the fused kernel's hard-zero mask
    cotangent (ADVICE r3).
    """
    if input_mask is not None:
        input_mask = jax.lax.stop_gradient(input_mask)
    if fused_frontend:
        from ..ops.pallas.frontend import fused_frontend as _ff

        return _ff(
            params["embed"], params["input_conv"], x_classes,
            input_mask=input_mask,
            compute_dtype=str(jnp.dtype(dtype)),
            interpret=jax.default_backend() == "cpu",
        )
    if mm_embed_grad:
        e = embed_lookup_mm(params["embed"], x_classes)  # (B, T, C)
    else:
        e = params["embed"][x_classes]  # (B, T, C)
    if input_mask is not None:
        e = e * input_mask[..., None]
    w = params["input_conv"]["w"]  # (K, C, C), tap k applies to t-(K-1-k)
    k_taps = w.shape[0]
    h = params["input_conv"]["b"].astype(jnp.float32)
    h = h + sum(
        _mm(shift_right(e, k_taps - 1 - k), w[k], dtype) for k in range(k_taps)
    )
    if input_mask is not None:
        h = h * input_mask[..., None]
    return h


def post_network(params: Params, skip_sum: jnp.ndarray, dtype) -> jnp.ndarray:
    p = params["post"]
    h = jax.nn.relu(skip_sum)
    h = jax.nn.relu(_mm(h, p["w1"], dtype) + p["b1"])
    return _mm(h, p["w2"], dtype) + p["b2"]


def forward(
    params: Params,
    arch: ArchConfig,
    x_classes: jnp.ndarray,
    cond_frames: Optional[jnp.ndarray] = None,
    speaker_ids: Optional[jnp.ndarray] = None,
    input_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    cond: Optional[jnp.ndarray] = None,
    return_skip: bool = False,
    mm_embed_grad: bool = False,
    fused_frontend: bool = False,
) -> jnp.ndarray:
    """Teacher-forced forward: classes (B, T) -> logits (B, T, Q).

    return_skip=True returns the pre-post-network skip accumulator
    (B, T, S) instead — the hook the fused post+loss kernel
    (ops/pallas/post_loss.py, TrainConfig.fused_post) consumes.

    logits[:, t] is the categorical distribution over sample t+1. The layer
    loop is unrolled in Python (L is static and small) so every dilation's
    shift lowers to a pad/slice and every matmul hits the MXU.

    Conditioning comes either as frame-rate `cond_frames` (upsampled here)
    or as pre-upsampled sample-rate `cond` (B, T, Cc) — the hook the
    sequence-parallel path uses, where the upsampling runs globally and
    each time shard passes its halo-extended cond slice.

    remat=True wraps each gated layer in jax.checkpoint: activations are
    recomputed in the backward pass, cutting peak activation memory ~L-fold
    for long windows (jax.checkpoint is the TPU way to trade MXU FLOPs for
    HBM capacity).
    """
    dtype = jnp.dtype(arch.compute_dtype)
    lp = params["layers"]
    if input_mask is not None:
        # Structural, non-differentiable by contract (see input_frontend):
        # covers the per-layer residual re-masking below too.
        input_mask = jax.lax.stop_gradient(input_mask)
    if cond is not None and cond_frames is not None:
        raise ValueError("pass cond_frames OR pre-upsampled cond, not both")
    if cond_frames is not None:
        from .conditioning import upsample_cond

        cond = upsample_cond(params["upsampler"], arch, cond_frames, dtype)
        cond = cond[:, : x_classes.shape[1]]
    gcond = None
    if speaker_ids is not None:
        gcond = params["speaker_embed"][speaker_ids][:, None, :]  # (B, 1, E)

    h = input_frontend(
        params, arch, x_classes, dtype, input_mask=input_mask,
        mm_embed_grad=mm_embed_grad, fused_frontend=fused_frontend,
    )
    def one_layer(h, i, d):
        h_new, z = gated_unit(
            h, shift_right(h, d), lp, i, dtype, cond=cond, gcond=gcond
        )
        if input_mask is not None:
            # Keep masked rows at EXACTLY zero through the whole stack so a
            # dilated tap into the masked halo reads the same zeros the
            # unsharded shift_right padding provides (biases would
            # otherwise leak in; see input_frontend).
            h_new = h_new * input_mask[..., None]
        return h_new, z

    if remat:
        one_layer = jax.checkpoint(one_layer, static_argnums=(1, 2))
    zs = []
    for i, d in enumerate(arch.dilations):
        h, z = one_layer(h, i, d)
        zs.append(z)
    # Skip accumulation as ONE stacked contraction over (layer, gate): the
    # 30-step (B, T, S) read-modify-write chain (the training step's HBM
    # bottleneck — ~3.5 GB/step at B=8, W=4096) becomes MXU-internal
    # accumulation. Bias sum is constant: sum_l b_skip[l].
    z_all = jnp.stack(zs, axis=0)  # (L, B, T, G)
    skip_sum = jax.lax.dot_general(
        z_all.astype(dtype),
        params["layers"]["w_skip"].astype(dtype),
        (((0, 3), (0, 1)), ((), ())),  # contract (l, g) -> (B, T, S)
        preferred_element_type=jnp.float32,
    ) + jnp.sum(params["layers"]["b_skip"], axis=0)
    if return_skip:
        return skip_sum
    return post_network(params, skip_sum, dtype)


def masked_loss_sums(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    window_size: int,
) -> tuple:
    """(sum of masked CE, sum of mask) — the accumulable form of
    masked_loss, used by gradient accumulation to keep the global masked
    MEAN exact across microbatches (each micro contributes its numerator
    and denominator; the division happens once at the end)."""
    w_logits = logits[:, -window_size:, :]
    ce = -jax.nn.log_softmax(w_logits, axis=-1)
    ce = jnp.take_along_axis(ce, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(ce * mask), jnp.sum(mask)


def masked_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    window_size: int,
) -> jnp.ndarray:
    """Boundary-masked mean CE over the last `window_size` logits.

    logits: (B, R-1+W, Q); targets/mask: (B, W). logits[:, -W + j] predicts
    targets[:, j] (see ops/geometry.py for the alignment derivation).
    """
    num, den = masked_loss_sums(logits, targets, mask, window_size)
    return num / jnp.maximum(den, 1.0)
