"""Fused post-network + masked-CE kernels (fwd + custom-VJP bwd).

VERDICT r2 item 1(b): the on-chip training profile (docs/kernels.md,
scripts/train_profile.py) attributes 2.93 ms of the 11.47 ms device step
(26%) to the XLA tail, a large part of which is the post-network + loss:
the (B, T, S) skip tensor and its (B, T, S) hidden / (B, T, Q) logits /
log-softmax intermediates each round-trip HBM, and the backward pass
re-reads them all. These kernels keep everything between `skip` and the
scalar loss numerator inside VMEM:

  Forward — grid (B, nT) tiles over time: per tile, relu -> (Tt,S)@(S,S)
  -> relu -> (Tt,S)@(S,Q) -> log-sum-exp -> CE -> masked sum into a VMEM
  scalar accumulator, written once at the last grid step. Only `skip` is
  read from HBM; h1/logits/softmax never exist outside VMEM. Tiles that
  lie entirely in the receptive-field head (positions before the scored
  window — their mask is zero by construction) are skipped statically,
  realizing the "slice skip to the last W positions before the post
  network" saving for free (the reference path computes post over ALL
  R-1+W positions and slices logits afterwards).

  Backward — same grid: recomputes h1/logits/softmax from skip (cheap,
  full-depth K>=256 contractions), forms dlogits = (softmax - onehot) *
  mask * gbar in VMEM, streams dskip out per tile, and accumulates the
  four post-weight gradients in VMEM scratch across the whole grid.

The loss contract is masked_loss_sums' NUMERATOR: sum(ce * mask) over the
full padded length with mask zero outside the scored window — the
denominator sum(mask) carries no parameter dependence and stays in XLA.
Reduction order is deterministic (sequential grid), but differs from the
XLA reduction order, so parity with the XLA loss is to float tolerance
(tests/test_train_kernel.py); gradient accumulation remains exact in the
num/den formulation up to the same per-micro summation-order rounding.

Opt-in via TrainConfig.fused_post (production configs; requires
fused_stack so the skip tensor is produced directly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # time rows per grid step (VMEM ~3 MB of tiles at S=Q=256)


def _fwd_kernel(
    skip_ref,                  # (1, Tt, S) f32 (zero rows past t_dim)
    tgt_ref,                   # (1, Tt, 1) int32 (zero outside window)
    mask_ref,                  # (1, Tt, 1) f32  (zero outside window)
    w1_ref, b1_ref,            # (S, S) (1, S)
    w2_ref, b2_ref,            # (S, Q) (1, Q)
    num_ref,                   # out (1, 1) f32
    num_s,                     # scratch (1, 1) f32
    *,
    compute_dtype,
    first_active: int,
):
    b_id = pl.program_id(0)
    i = pl.program_id(1)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(b_id == 0, i == 0))
    def _():
        num_s[:] = jnp.zeros_like(num_s)

    @pl.when(i >= first_active)
    def _():
        a = jnp.maximum(skip_ref[0], 0.0)
        h1 = jnp.maximum(mm(a, w1_ref[:]) + b1_ref[0], 0.0)
        v = mm(h1, w2_ref[:]) + b2_ref[0]              # (Tt, Q) f32 logits
        m = jnp.max(v, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(v - m), axis=-1, keepdims=True)) + m
        q = v.shape[-1]
        tile = v.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, q), 1)
        onehot = (col == tgt_ref[0]).astype(jnp.float32)     # (Tt, 1) bcast
        picked = jnp.sum(v * onehot, axis=-1, keepdims=True)
        ce = lse - picked                                    # (Tt, 1)
        num_s[:] = num_s[:] + jnp.sum(ce * mask_ref[0])[None, None]

    last = jnp.logical_and(
        b_id == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
    )

    @pl.when(last)
    def _():
        num_ref[:] = num_s[:]


def _bwd_kernel(
    skip_ref, tgt_ref, mask_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    w1T_ref, w2T_ref,          # (S, S) (Q, S) transposed
    gbar_ref,                  # (1, 1) f32 upstream cotangent of num
    dskip_ref,                 # out (1, Tt, S) f32
    dw1_ref, db1_ref,          # out (S, S) (1, S)
    dw2_ref, db2_ref,          # out (S, Q) (1, Q)
    dw1_s, db1_s, dw2_s, db2_s,
    *,
    compute_dtype,
    first_active: int,
):
    b_id = pl.program_id(0)
    i = pl.program_id(1)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmT(a, bmat):
        # contract over rows: (T, M)^T @ (T, N) -> (M, N)
        return jax.lax.dot_general(
            a.astype(dt), bmat.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(b_id == 0, i == 0))
    def _():
        dw1_s[:] = jnp.zeros_like(dw1_s)
        db1_s[:] = jnp.zeros_like(db1_s)
        dw2_s[:] = jnp.zeros_like(dw2_s)
        db2_s[:] = jnp.zeros_like(db2_s)

    @pl.when(i < first_active)
    def _():
        dskip_ref[0] = jnp.zeros_like(dskip_ref[0])

    @pl.when(i >= first_active)
    def _():
        skip_t = skip_ref[0]
        a = jnp.maximum(skip_t, 0.0)
        u = mm(a, w1_ref[:]) + b1_ref[0]
        h1 = jnp.maximum(u, 0.0)
        v = mm(h1, w2_ref[:]) + b2_ref[0]
        m = jnp.max(v, axis=-1, keepdims=True)
        e = jnp.exp(v - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)     # softmax (Tt, Q)
        q = v.shape[-1]
        tile = v.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, q), 1)
        onehot = (col == tgt_ref[0]).astype(jnp.float32)     # (Tt, 1) bcast
        g = (p - onehot) * (mask_ref[0] * gbar_ref[0, 0])
        dw2_s[:] = dw2_s[:] + mmT(h1, g)
        db2_s[:] = db2_s[:] + jnp.sum(g, axis=0, keepdims=True)
        dh1 = mm(g, w2T_ref[:])
        du = jnp.where(u > 0.0, dh1, 0.0)
        dw1_s[:] = dw1_s[:] + mmT(a, du)
        db1_s[:] = db1_s[:] + jnp.sum(du, axis=0, keepdims=True)
        da = mm(du, w1T_ref[:])
        dskip_ref[0] = jnp.where(skip_t > 0.0, da, 0.0)

    last = jnp.logical_and(
        b_id == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
    )

    @pl.when(last)
    def _():
        dw1_ref[:] = dw1_s[:]
        db1_ref[:] = db1_s[:]
        dw2_ref[:] = dw2_s[:]
        db2_ref[:] = db2_s[:]


def _pick_tile(t_dim: int) -> int:
    if t_dim >= _TILE:
        return _TILE
    return max(128, 1 << int(np.ceil(np.log2(max(t_dim, 2)))))


@functools.partial(
    jax.jit, static_argnames=("window_size", "compute_dtype", "interpret")
)
def fused_post_loss(
    post: dict,
    skip: jnp.ndarray,        # (B, T, S) f32 — full R-1+W length
    targets: jnp.ndarray,     # (B, W) int32
    mask: jnp.ndarray,        # (B, W) f32
    window_size: int,
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
):
    """sum(ce * mask) over the last `window_size` positions — the masked
    CE NUMERATOR of masked_loss_sums, with the post network fused in.
    Differentiable in (post, skip) via the Pallas backward kernel;
    targets/mask are structural (zero cotangent)."""
    bsz, t_dim, s = skip.shape
    q = post["w2"].shape[-1]
    dt = jnp.dtype(compute_dtype)
    tile = _pick_tile(t_dim)
    n_tiles = -(-t_dim // tile)
    head = t_dim - window_size
    first_active = head // tile  # tiles fully inside the unscored head
    t_pad = n_tiles * tile

    # Window-aligned padded targets/mask: position head + j scores
    # targets[:, j]; everything else (head rows AND tile-pad tail rows)
    # is zero-masked, so the kernel needs no extra window bookkeeping.
    # (B, t_pad, 1) layout: Mosaic requires the last two block dims be
    # (8k, 128m) or equal to the array dims — a trailing singleton makes
    # the (1, tile, 1) block legal.
    tgt_p = jnp.zeros((bsz, t_pad), jnp.int32)
    tgt_p = jax.lax.dynamic_update_slice(
        tgt_p, targets.astype(jnp.int32), (0, head)
    )[..., None]
    mask_p = jnp.zeros((bsz, t_pad), jnp.float32)
    mask_p = jax.lax.dynamic_update_slice(
        mask_p, mask.astype(jnp.float32), (0, head)
    )[..., None]
    # Zero-pad skip's tile-ragged tail OUTSIDE the custom_vjp: padded rows
    # are exact zeros, so exp/log in the kernel stay finite and the pad's
    # own autodiff slices the (B, t_pad, S) dskip back to (B, t_dim, S).
    if t_pad != t_dim:
        skip = jnp.pad(skip, ((0, 0), (0, t_pad - t_dim), (0, 0)))

    def clamp_idx3(b, i):
        # Head tiles (statically skipped) re-map to the first active
        # block: an unchanged block index is not refetched, so their skip
        # reads cost nothing.
        return (b, jnp.maximum(i, first_active), 0)

    skip_spec = pl.BlockSpec((1, tile, s), clamp_idx3, memory_space=pltpu.VMEM)
    tm_spec = pl.BlockSpec((1, tile, 1), clamp_idx3, memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def run_fwd(pp, skip_, tgt_, mask_):
        (num,) = pl.pallas_call(
            functools.partial(
                _fwd_kernel, compute_dtype=dt, first_active=first_active,
            ),
            grid=(bsz, n_tiles),
            in_specs=[
                skip_spec, tm_spec, tm_spec,
                whole((s, s)), whole((1, s)),
                whole((s, q)), whole((1, q)),
            ],
            out_specs=[whole((1, 1))],
            out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32)],
            interpret=interpret,
        )(
            skip_, tgt_, mask_,
            pp["w1"], pp["b1"][None, :], pp["w2"], pp["b2"][None, :],
        )
        return num[0, 0]

    def run_bwd(pp, skip_, tgt_, mask_, gbar):
        dskip_spec = pl.BlockSpec(
            (1, tile, s), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            functools.partial(
                _bwd_kernel, compute_dtype=dt, first_active=first_active,
            ),
            grid=(bsz, n_tiles),
            in_specs=[
                skip_spec, tm_spec, tm_spec,
                whole((s, s)), whole((1, s)),
                whole((s, q)), whole((1, q)),
                whole((s, s)), whole((q, s)),
                whole((1, 1)),
            ],
            out_specs=[
                dskip_spec,
                whole((s, s)), whole((1, s)),
                whole((s, q)), whole((1, q)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, t_pad, s), jnp.float32),
                jax.ShapeDtypeStruct((s, s), jnp.float32),
                jax.ShapeDtypeStruct((1, s), jnp.float32),
                jax.ShapeDtypeStruct((s, q), jnp.float32),
                jax.ShapeDtypeStruct((1, q), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((s, s), jnp.float32),
                pltpu.VMEM((1, s), jnp.float32),
                pltpu.VMEM((s, q), jnp.float32),
                pltpu.VMEM((1, q), jnp.float32),
            ],
            interpret=interpret,
        )(
            skip_, tgt_, mask_,
            pp["w1"], pp["b1"][None, :], pp["w2"], pp["b2"][None, :],
            jnp.swapaxes(pp["w1"], 0, 1), jnp.swapaxes(pp["w2"], 0, 1),
            jnp.full((1, 1), gbar, jnp.float32),
        )
        dskip, dw1, db1, dw2, db2 = outs
        dpp = {"w1": dw1, "b1": db1[0], "w2": dw2, "b2": db2[0]}
        return dpp, dskip

    @jax.custom_vjp
    def f(pp, skip_, tgt_, mask_):
        return run_fwd(pp, skip_, tgt_, mask_)

    def f_fwd(pp, skip_, tgt_, mask_):
        return run_fwd(pp, skip_, tgt_, mask_), (pp, skip_, tgt_, mask_)

    def f_bwd(res, gbar):
        pp, skip_, tgt_, mask_ = res
        dpp, dskip = run_bwd(pp, skip_, tgt_, mask_, gbar)
        return (
            dpp, dskip,
            np.zeros(tgt_.shape, jax.dtypes.float0),
            jnp.zeros_like(mask_),
        )

    f.defvjp(f_fwd, f_bwd)
    return f(post, skip, tgt_p, mask_p)
