"""Fused training-stack kernels: whole dilated stack fwd + custom-VJP bwd.

SURVEY.md §2.2 names this the training-side speed-of-light target. The XLA
training step is HBM-bound on per-layer activation traffic (pre, z, res,
skip round-trips: ~60 MB per batch row per direction). These kernels keep
the residual stream and the skip accumulator IN VMEM across all layers:

  Forward  — grid (B, L): per batch row, layers run sequentially with the
  (T, C) residual stream and (T, S) skip accumulator in scratch. Only the
  gate output z (the minimal sufficient statistic) is written to HBM for
  the backward pass, plus the final skip sum. A dilated shift is free: the
  1x1-ness of every projection means shift(x) @ W == shift(x @ W), realized
  as a dynamic slice of a zero-padded VMEM staging buffer (dilation is
  scalar-prefetched).

  Backward — grid (B, L) with layers reversed: the residual stream is
  RECONSTRUCTED backwards (x_l = x_{l+1} - z_l @ w_res - b_res; bitwise the
  same product as forward, so reconstruction error is one rounding of the
  residual add), pre-activations are recomputed from it, and all weight
  gradients accumulate in VMEM scratch across the entire grid, written out
  once at the last step. Gradients stream: dx via the transposed
  projections with the adjoint (left) shift; dh0 and d(cond) emerge at the
  last reverse layer.

Exposed as `fused_stack(...)` with jax.custom_vjp — a drop-in for the layer
loop of models/wavenet.forward (training path: TrainConfig.fused_stack).
Parity: tests/test_train_kernel.py checks fwd and grads against the XLA
path in interpret mode; on-chip validation in BASELINE.md.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ArchConfig

# v5e has 128 MB of VMEM; the backward kernel's working set scales with
# t_dim (W + R - 1) and crosses 100 MB around W = 8192 — leave only the
# margin the pipeline needs.
_VMEM_LIMIT = 116 * 1024 * 1024
# Long-window shapes (the r4 sweep: throughput rises monotonically with W
# up to the VMEM edge — 5.02M @ W=6144 -> 5.80M @ micro4/W=10240) get the
# remaining physical headroom: micro8 x W=10240 missed the 116M cap by
# 713K (measured). Granted CONDITIONALLY so every existing shape keeps its
# compile-cache key and measured behavior.
_VMEM_LIMIT_XL = 121 * 1024 * 1024


def _vmem_limit(t_dim: int, has_cond: bool = False) -> int:
    # Thresholds sit just below the measured edges: plain micro8/W=10240
    # needs 116.70M at t_dim 13310; the SP formulation reaches t_dim 12284
    # at n=1/W=6144; the mel bwd adds the (T, Cc) cond block + dcond/dwcond
    # scratch and crosses 116M already at t_dim 9214 (118.62M measured).
    if t_dim > 11500 or (has_cond and t_dim > 8192):
        return _VMEM_LIMIT_XL
    return _VMEM_LIMIT


def _fwd_kernel(
    dils_ref,                      # (L,) scalar prefetch
    h0_ref,                        # (1, T, C) this row's input
    wc_ref, wp_ref, b_ref,         # (1,C,2G) (1,C,2G) (1,1,2G)
    wr_ref, br_ref,                # (1,G,C) (1,1,C)
    ws_ref, bs_ref,                # (1,G,S) (1,1,S)
    cond_ref, wcond_ref,           # (1,T,Cc) (1,Cc,2G) or None
    mask_ref,                      # (1,T,1) residual-stream mask or None
    z_ref,                         # out (1,1,T,G)
    skip_ref,                      # out (1,T,S)
    xfin_ref,                      # out (1,T,C): final residual stream
    x_s, skip_s, stage_s,          # scratch (T,C) (T,S) (T+maxd,2G)
    *,
    compute_dtype,
    n_layers: int,
    max_d: int,
):
    l = pl.program_id(1)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(l == 0)
    def _():
        x_s[:] = h0_ref[0]

    d = dils_ref[l]
    x = x_s[:]
    xc = mm(x, wc_ref[0])
    xp = mm(x, wp_ref[0])
    # shift(x) @ Wp == shift(x @ Wp): zero-pad then dynamic-slice by d.
    stage_s[pl.ds(0, max_d)] = jnp.zeros_like(stage_s[pl.ds(0, max_d)])
    stage_s[pl.ds(max_d, xp.shape[0])] = xp
    xp_shifted = stage_s[pl.ds(max_d - d, xp.shape[0])]
    pre = xc + xp_shifted + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[0], wcond_ref[0])
    g = pre.shape[-1] // 2
    z = jnp.tanh(pre[:, :g]) * jax.nn.sigmoid(pre[:, g:])
    # z is saved in COMPUTE dtype: every backward consumer (x
    # reconstruction, dwr/dws contractions) casts z to compute_dtype inside
    # its matmul anyway, so bf16 storage is bit-neutral for bf16 archs and
    # halves the largest HBM tensor of the training step.
    z_ref[0, 0] = z.astype(z_ref.dtype)
    x_new = x + mm(z, wr_ref[0]) + br_ref[0, 0]
    if mask_ref is not None:
        # Sequence-parallel halo masking (parallel/halo.py): keep masked
        # rows at EXACTLY zero through the whole stack, matching the XLA
        # forward's per-layer re-mask (multiplying unmasked rows by 1.0 is
        # bitwise neutral, so the mask path stays parity-exact).
        x_new = x_new * mask_ref[0]
    x_s[:] = x_new
    contrib = mm(z, ws_ref[0]) + bs_ref[0, 0]

    @pl.when(l == 0)
    def _():
        skip_s[:] = contrib

    @pl.when(l > 0)
    def _():
        skip_s[:] = skip_s[:] + contrib

    @pl.when(l == n_layers - 1)
    def _():
        skip_ref[0] = skip_s[:]
        # Final residual stream — the backward pass reconstructs layer
        # inputs from it; emitting it here (T*C write) replaces an XLA
        # einsum over the ENTIRE z_all tensor (L*T*G read, ~30x more HBM
        # traffic at wavenet30).
        xfin_ref[0] = x_s[:]


def _fwd_kernel_tc(
    dils_ref,                      # (L,) scalar prefetch
    h0_ref,                        # (1, T, C)
    wcp_ref, b_ref,                # (1,2C,2G) [w_cur; w_prev] stacked, (1,1,2G)
    wr_ref, br_ref,                # (1,G,C) (1,1,C)
    ws_ref, bs_ref,                # (1,G,S) (1,1,S)
    cond_ref, wcond_ref,           # (1,T,Cc) (1,Cc,2G) or None
    mask_ref,                      # (1,T,1) residual-stream mask or None
    z_ref, skip_ref, xfin_ref,     # outs (1,1,T,G) (1,T,S) (1,T,C)
    x_s, skip_s, xcat_s,           # scratch (T,C) (T,S) (T+maxd,2C)
    *,
    compute_dtype,
    n_layers: int,
    max_d: int,
):
    """Tap-concat forward: the two width-2 taps become ONE K=2C matmul.

    The default kernel computes xc = x @ w_cur and xp = shift(x @ w_prev)
    as two K=C contractions — at C=64 each fills only half the MXU's
    128-deep systolic array. Here [x | shift(x)] is built in a padded
    (T+maxd, 2C) buffer with the SAME copy traffic as the default's xp
    staging: x is written once per column half — statically at row maxd in
    the shift half, at the dynamic offset maxd-d in the current half — so
    the slice [maxd-d : maxd-d+T) reads [x | shift(x)] directly, and one
    full-depth (2C, 2G) contraction replaces the two half-filled ones.
    """
    l = pl.program_id(1)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t_dim, c = x_s.shape

    @pl.when(l == 0)
    def _():
        x_s[:] = h0_ref[0]
        # Shift-half head rows: zero once; never overwritten afterwards
        # (the static x write starts at row maxd, the dynamic write only
        # touches the current-half columns).
        xcat_s[pl.ds(0, max_d), c:] = jnp.zeros(
            (max_d, c), dtype=jnp.float32
        )

    d = dils_ref[l]
    x = x_s[:]
    xcat_s[pl.ds(max_d, t_dim), c:] = x          # shift half (static row)
    xcat_s[pl.ds(max_d - d, t_dim), :c] = x      # current half (dynamic row)
    xcat = xcat_s[pl.ds(max_d - d, t_dim), :]
    pre = mm(xcat, wcp_ref[0]) + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[0], wcond_ref[0])
    g = pre.shape[-1] // 2
    z = jnp.tanh(pre[:, :g]) * jax.nn.sigmoid(pre[:, g:])
    z_ref[0, 0] = z.astype(z_ref.dtype)
    x_new = x + mm(z, wr_ref[0]) + br_ref[0, 0]
    if mask_ref is not None:
        x_new = x_new * mask_ref[0]  # see _fwd_kernel's mask note
    x_s[:] = x_new
    contrib = mm(z, ws_ref[0]) + bs_ref[0, 0]

    @pl.when(l == 0)
    def _():
        skip_s[:] = contrib

    @pl.when(l > 0)
    def _():
        skip_s[:] = skip_s[:] + contrib

    @pl.when(l == n_layers - 1)
    def _():
        skip_ref[0] = skip_s[:]
        xfin_ref[0] = x_s[:]


def _bwd_kernel_tc(
    dils_ref,                      # (L,) scalar prefetch (forward order)
    gskip_ref,                     # (1, T, S)
    xfin_ref,                      # (1, T, C)
    z_ref,                         # (1, 1, T, G) of layer lr
    wcp_ref, b_ref,                # (1,2C,2G) (1,1,2G)
    wr_ref, br_ref,                # (1,G,C) (1,1,C)
    wcT_ref, wpT_ref,              # (1,2G,C) x2
    wrT_ref, wsT_ref,              # (1,C,G) (1,S,G)
    cond_ref, wcond_ref, wcondT_ref,  # or None
    mask_ref,                      # (1,T,1) residual-stream mask or None
    # outputs
    dh0_ref,                       # (1, T, C)
    dwcp_ref, db_ref,              # (L,2C,2G) [dwc; dwp] merged, (L,1,2G)
    dwr_ref, dbr_ref,              # (L,G,C) (L,1,C)
    dws_ref, dbs_ref,              # (L,G,S) (L,1,S)
    dcond_ref, dwcond_ref,         # or None
    # scratch
    x_s, dx_s, stage_s, xcat_s,
    dwcp_s, db_s, dwr_s, dbr_s, dws_s, dbs_s, dwcond_s, dcond_s,
    *,
    compute_dtype,
    n_layers: int,
    max_d: int,
):
    """Tap-concat backward: the recompute uses the K=2C merged matmul and
    the two tap weight-gradients become ONE M=2C contraction
    ([x | shift(x)]^T @ dpre) — the default's two M=C contractions each
    fill only half the MXU's row dimension. xcat uses the same padded
    (T+maxd, 2C) layout as the forward (one write per column half);
    stage_s (T+maxd, C) serves the dproj left-shift."""
    li = pl.program_id(1)
    b_id = pl.program_id(0)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmT(a, bmat):
        return jax.lax.dot_general(
            a.astype(dt), bmat.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t_dim, c_dim = x_s.shape
    first = jnp.logical_and(b_id == 0, li == 0)

    @pl.when(first)
    def _():
        dwcp_s[:] = jnp.zeros_like(dwcp_s)
        db_s[:] = jnp.zeros_like(db_s)
        dwr_s[:] = jnp.zeros_like(dwr_s)
        dbr_s[:] = jnp.zeros_like(dbr_s)
        dws_s[:] = jnp.zeros_like(dws_s)
        dbs_s[:] = jnp.zeros_like(dbs_s)
        if dwcond_s is not None:
            dwcond_s[:] = jnp.zeros_like(dwcond_s)

    @pl.when(li == 0)
    def _():
        x_s[:] = xfin_ref[0]
        dx_s[:] = jnp.zeros_like(dx_s)
        # dproj left-shift tail zeros + xcat shift-half head zeros: written
        # once per batch row (never overwritten by the per-layer writes).
        stage_s[pl.ds(t_dim, max_d)] = jnp.zeros(
            (max_d, c_dim), dtype=jnp.float32
        )
        xcat_s[pl.ds(0, max_d), c_dim:] = jnp.zeros(
            (max_d, c_dim), dtype=jnp.float32
        )
        if dcond_s is not None:
            dcond_s[:] = jnp.zeros_like(dcond_s)

    d = dils_ref[n_layers - 1 - li]
    z = z_ref[0, 0]
    dx_next = dx_s[:]
    gskip = gskip_ref[0]

    x_cur = x_s[:] - mm(z, wr_ref[0]) - br_ref[0, 0]
    if mask_ref is not None:
        # Forward applied x_{l+1} = (x_l + z@wr + br) * m with masked rows
        # exactly zero: invert by re-masking (unmasked rows multiply by 1.0
        # — bitwise neutral), and kill the gradient through the mask
        # multiply (dy = dx_{l+1} * m) before any adjoint consumes it.
        x_cur = x_cur * mask_ref[0]
        dx_next = dx_next * mask_ref[0]
    x_s[:] = x_cur

    # Recompute pre via the merged tap contraction (bitwise the same pre as
    # the tapcat forward: identical operands, identical K order).
    xcat_s[pl.ds(max_d, t_dim), c_dim:] = x_cur
    xcat_s[pl.ds(max_d - d, t_dim), :c_dim] = x_cur
    xcat = xcat_s[pl.ds(max_d - d, t_dim), :]
    pre = mm(xcat, wcp_ref[0]) + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[0], wcond_ref[0])
    g = pre.shape[-1] // 2
    tanh_v = jnp.tanh(pre[:, :g])
    sig_v = jax.nn.sigmoid(pre[:, g:])

    dz = mm(gskip, wsT_ref[0]) + mm(dx_next, wrT_ref[0])
    dpre = jnp.concatenate(
        [
            dz * sig_v * (1.0 - tanh_v * tanh_v),
            dz * tanh_v * sig_v * (1.0 - sig_v),
        ],
        axis=-1,
    )

    # dx: residual passthrough + both tap adjoints.
    dproj_p = mm(dpre, wpT_ref[0])
    stage_s[pl.ds(0, t_dim)] = dproj_p
    dx_cur = dx_next + mm(dpre, wcT_ref[0]) + stage_s[pl.ds(d, t_dim)]
    dx_s[:] = dx_cur

    lr = n_layers - 1 - li
    row_cp = lr * 2 * c_dim
    g_dim = z.shape[-1]
    row_g = lr * g_dim
    # Merged tap weight grads: one M=2C, K=T contraction.
    dwcp_s[pl.ds(row_cp, 2 * c_dim)] = (
        dwcp_s[pl.ds(row_cp, 2 * c_dim)] + mmT(xcat, dpre)
    )
    db_s[pl.ds(lr, 1)] = db_s[pl.ds(lr, 1)] + jnp.sum(
        dpre, axis=0, keepdims=True
    )
    dwr_s[pl.ds(row_g, g_dim)] = dwr_s[pl.ds(row_g, g_dim)] + mmT(z, dx_next)
    dbr_s[pl.ds(lr, 1)] = dbr_s[pl.ds(lr, 1)] + jnp.sum(
        dx_next, axis=0, keepdims=True
    )
    dws_s[pl.ds(row_g, g_dim)] = dws_s[pl.ds(row_g, g_dim)] + mmT(z, gskip)
    dbs_s[pl.ds(lr, 1)] = dbs_s[pl.ds(lr, 1)] + jnp.sum(
        gskip, axis=0, keepdims=True
    )
    if cond_ref is not None:
        cc = cond_ref.shape[-1]
        row_cc = lr * cc
        dwcond_s[pl.ds(row_cc, cc)] = dwcond_s[pl.ds(row_cc, cc)] + mmT(
            cond_ref[0], dpre
        )
        dcond_s[:] = dcond_s[:] + mm(dpre, wcondT_ref[0])

    @pl.when(li == n_layers - 1)
    def _():
        dh0_ref[0] = dx_s[:]
        if dcond_ref is not None:
            dcond_ref[0] = dcond_s[:]

    last = jnp.logical_and(
        b_id == pl.num_programs(0) - 1, li == n_layers - 1
    )

    @pl.when(last)
    def _():
        dwcp_ref[:] = dwcp_s[:].reshape(dwcp_ref.shape)
        db_ref[:] = db_s[:].reshape(db_ref.shape)
        dwr_ref[:] = dwr_s[:].reshape(dwr_ref.shape)
        dbr_ref[:] = dbr_s[:].reshape(dbr_ref.shape)
        dws_ref[:] = dws_s[:].reshape(dws_ref.shape)
        dbs_ref[:] = dbs_s[:].reshape(dbs_ref.shape)
        if dwcond_ref is not None:
            dwcond_ref[:] = dwcond_s[:].reshape(dwcond_ref.shape)


def _bwd_kernel(
    dils_ref,                      # (L,) scalar prefetch (forward order)
    gskip_ref,                     # (1, T, S) dL/dskip_sum for this row
    xfin_ref,                      # (1, T, C) forward-final residual stream
    z_ref,                         # (1, 1, T, G) saved z for layer lr
    wc_ref, wp_ref,                # (1,C,2G) x2      [layer lr]
    b_ref,                         # (1,1,2G)
    wr_ref, br_ref,                # (1,G,C) (1,1,C)
    wcT_ref, wpT_ref,              # (1,2G,C) x2 transposed
    wrT_ref,                       # (1,C,G)
    wsT_ref,                       # (1,S,G)
    cond_ref, wcond_ref, wcondT_ref,  # (1,T,Cc) (1,Cc,2G) (1,2G,Cc) or None
    mask_ref,                      # (1,T,1) residual-stream mask or None
    # outputs
    dh0_ref,                       # (1, T, C) @ row
    dwc_ref, dwp_ref, db_ref,      # (L,C,2G) (L,C,2G) (L,1,2G) whole
    dwr_ref, dbr_ref,              # (L,G,C) (L,1,C)
    dws_ref, dbs_ref,              # (L,G,S) (L,1,S)
    dcond_ref, dwcond_ref,         # (1,T,Cc) @ row, (L,Cc,2G) whole, or None
    # scratch
    x_s, dx_s, stage_s, stage2_s,
    dwc_s, dwp_s, db_s, dwr_s, dbr_s, dws_s, dbs_s, dwcond_s, dcond_s,
    *,
    compute_dtype,
    n_layers: int,
    max_d: int,
):
    li = pl.program_id(1)           # 0 .. L-1, layer lr = L-1-li (blocks
    b_id = pl.program_id(0)         # already reverse-indexed via index_map)
    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt), w.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmT(a, bmat):
        # contract over T: (T, M)^T @ (T, N) -> (M, N)
        return jax.lax.dot_general(
            a.astype(dt), bmat.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t_dim = x_s.shape[0]
    first = jnp.logical_and(b_id == 0, li == 0)

    @pl.when(first)
    def _():
        dwc_s[:] = jnp.zeros_like(dwc_s)
        dwp_s[:] = jnp.zeros_like(dwp_s)
        db_s[:] = jnp.zeros_like(db_s)
        dwr_s[:] = jnp.zeros_like(dwr_s)
        dbr_s[:] = jnp.zeros_like(dbr_s)
        dws_s[:] = jnp.zeros_like(dws_s)
        dbs_s[:] = jnp.zeros_like(dbs_s)
        if dwcond_s is not None:
            dwcond_s[:] = jnp.zeros_like(dwcond_s)

    @pl.when(li == 0)
    def _():
        x_s[:] = xfin_ref[0]
        dx_s[:] = jnp.zeros_like(dx_s)
        if dcond_s is not None:
            dcond_s[:] = jnp.zeros_like(dcond_s)

    d = dils_ref[n_layers - 1 - li]   # dilation of the actual layer lr
    z = z_ref[0, 0]
    dx_next = dx_s[:]
    gskip = gskip_ref[0]

    # Reconstruct layer input: x_lr = x_{lr+1} - (z @ w_res + b_res).
    x_cur = x_s[:] - mm(z, wr_ref[0]) - br_ref[0, 0]
    if mask_ref is not None:
        x_cur = x_cur * mask_ref[0]       # see _bwd_kernel_tc's mask note
        dx_next = dx_next * mask_ref[0]
    x_s[:] = x_cur

    # Recompute pre-activation (same formula as forward).
    xc = mm(x_cur, wc_ref[0])
    xp = mm(x_cur, wp_ref[0])
    stage_s[pl.ds(0, max_d)] = jnp.zeros_like(stage_s[pl.ds(0, max_d)])
    stage_s[pl.ds(max_d, t_dim)] = xp
    pre = xc + stage_s[pl.ds(max_d - d, t_dim)] + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[0], wcond_ref[0])
    g = pre.shape[-1] // 2
    tanh_v = jnp.tanh(pre[:, :g])
    sig_v = jax.nn.sigmoid(pre[:, g:])

    # dz from both consumers (skip projection and residual branch).
    dz = mm(gskip, wsT_ref[0]) + mm(dx_next, wrT_ref[0])
    dpre = jnp.concatenate(
        [
            dz * sig_v * (1.0 - tanh_v * tanh_v),
            dz * tanh_v * sig_v * (1.0 - sig_v),
        ],
        axis=-1,
    )

    # dx: residual passthrough + both tap adjoints (left-shift for w_prev).
    dproj_p = mm(dpre, wpT_ref[0])                     # (T, C)
    stage2_s[pl.ds(0, t_dim), :] = dproj_p
    stage2_s[pl.ds(t_dim, max_d), :] = jnp.zeros_like(
        stage2_s[pl.ds(t_dim, max_d), :]
    )
    dx_cur = dx_next + mm(dpre, wcT_ref[0]) + stage2_s[pl.ds(d, t_dim), :]
    dx_s[:] = dx_cur

    # Weight/bias gradient accumulation (over both grid axes).
    c_dim = x_cur.shape[-1]
    lr = n_layers - 1 - li
    row_c = lr * c_dim
    g_dim = z.shape[-1]
    row_g = lr * g_dim
    # shift(x_cur, d) for dwp: reuse stage_s layout with x columns.
    dwc_s[pl.ds(row_c, c_dim)] = dwc_s[pl.ds(row_c, c_dim)] + mmT(x_cur, dpre)
    # x shifted right by d (same padding trick; stage2 is C wide).
    stage2_s[pl.ds(0, max_d), :] = jnp.zeros_like(
        stage2_s[pl.ds(0, max_d), :]
    )
    stage2_s[pl.ds(max_d, t_dim), :] = x_cur
    x_shift = stage2_s[pl.ds(max_d - d, t_dim), :]
    dwp_s[pl.ds(row_c, c_dim)] = dwp_s[pl.ds(row_c, c_dim)] + mmT(x_shift, dpre)
    db_s[pl.ds(lr, 1)] = db_s[pl.ds(lr, 1)] + jnp.sum(
        dpre, axis=0, keepdims=True
    )
    dwr_s[pl.ds(row_g, g_dim)] = dwr_s[pl.ds(row_g, g_dim)] + mmT(z, dx_next)
    dbr_s[pl.ds(lr, 1)] = dbr_s[pl.ds(lr, 1)] + jnp.sum(
        dx_next, axis=0, keepdims=True
    )
    dws_s[pl.ds(row_g, g_dim)] = dws_s[pl.ds(row_g, g_dim)] + mmT(z, gskip)
    dbs_s[pl.ds(lr, 1)] = dbs_s[pl.ds(lr, 1)] + jnp.sum(
        gskip, axis=0, keepdims=True
    )
    if cond_ref is not None:
        cc = cond_ref.shape[-1]
        row_cc = lr * cc
        dwcond_s[pl.ds(row_cc, cc)] = dwcond_s[pl.ds(row_cc, cc)] + mmT(
            cond_ref[0], dpre
        )
        dcond_s[:] = dcond_s[:] + mm(dpre, wcondT_ref[0])

    @pl.when(li == n_layers - 1)
    def _():
        dh0_ref[0] = dx_s[:]
        if dcond_ref is not None:
            dcond_ref[0] = dcond_s[:]

    last = jnp.logical_and(
        b_id == pl.num_programs(0) - 1, li == n_layers - 1
    )

    @pl.when(last)
    def _():
        L = n_layers
        dwc_ref[:] = dwc_s[:].reshape(dwc_ref.shape)
        dwp_ref[:] = dwp_s[:].reshape(dwp_ref.shape)
        db_ref[:] = db_s[:].reshape(db_ref.shape)
        dwr_ref[:] = dwr_s[:].reshape(dwr_ref.shape)
        dbr_ref[:] = dbr_s[:].reshape(dbr_ref.shape)
        dws_ref[:] = dws_s[:].reshape(dws_ref.shape)
        dbs_ref[:] = dbs_s[:].reshape(dbs_ref.shape)
        if dwcond_ref is not None:
            dwcond_ref[:] = dwcond_s[:].reshape(dwcond_ref.shape)


def _whole(shape):
    # index maps take (b, l, *scalar_prefetch_refs)
    return pl.BlockSpec(
        shape, lambda b, l, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _row(shape):
    return pl.BlockSpec(
        (1,) + shape, lambda b, l, *_: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )


def _lyr(shape, rev=False):
    if rev:
        return pl.BlockSpec(
            (1,) + shape,
            lambda b, l, *_: (pl.num_programs(1) - 1 - l,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1,) + shape, lambda b, l, *_: (l,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )


def _fwd_call(lp, arch: ArchConfig, h0, cond, interpret, tapcat=False,
              mask=None):
    L = len(arch.dilations)
    bsz, t_dim, c = h0.shape
    two_g = lp["w_cur"].shape[-1]
    gch = two_g // 2
    s = arch.skip_channels
    max_d = max(arch.dilations)
    dt = jnp.dtype(arch.compute_dtype)
    dils = jnp.asarray(arch.dilations, jnp.int32)

    if tapcat:
        # Stacked tap weight: one (2C, 2G) full-depth contraction per layer.
        wcp = jnp.concatenate([lp["w_cur"], lp["w_prev"]], axis=1)
        in_specs = [
            _row((t_dim, c)),
            _lyr((2 * c, two_g)), _lyr((1, two_g)),
            _lyr((gch, c)), _lyr((1, c)),
            _lyr((gch, s)), _lyr((1, s)),
        ]
        args = [
            h0,
            wcp, lp["b"][:, None, :],
            lp["w_res"], lp["b_res"][:, None, :],
            lp["w_skip"], lp["b_skip"][:, None, :],
        ]
        scratch = [
            pltpu.VMEM((t_dim, c), jnp.float32),
            pltpu.VMEM((t_dim, s), jnp.float32),
            pltpu.VMEM((t_dim + max_d, 2 * c), jnp.float32),
        ]
    else:
        in_specs = [
            _row((t_dim, c)),
            _lyr((c, two_g)), _lyr((c, two_g)), _lyr((1, two_g)),
            _lyr((gch, c)), _lyr((1, c)),
            _lyr((gch, s)), _lyr((1, s)),
        ]
        args = [
            h0,
            lp["w_cur"], lp["w_prev"], lp["b"][:, None, :],
            lp["w_res"], lp["b_res"][:, None, :],
            lp["w_skip"], lp["b_skip"][:, None, :],
        ]
        scratch = [
            pltpu.VMEM((t_dim, c), jnp.float32),
            pltpu.VMEM((t_dim, s), jnp.float32),
            pltpu.VMEM((t_dim + max_d, two_g), jnp.float32),
        ]
    has_cond = cond is not None
    if has_cond:
        cc = lp["w_cond"].shape[1]
        in_specs += [_row((t_dim, cc)), _lyr((cc, two_g))]
        args += [cond, lp["w_cond"]]
    has_mask = mask is not None
    if has_mask:
        in_specs += [_row((t_dim, 1))]
        args += [mask.astype(jnp.float32)[..., None]]

    base = functools.partial(
        _fwd_kernel_tc if tapcat else _fwd_kernel,
        compute_dtype=dt, n_layers=L, max_d=max_d,
    )
    n_in = len(args)

    def kernel(dils_r, *rest):
        ins = list(rest[:n_in])
        tail = rest[n_in:]  # outputs + scratch, positionally unchanged
        mask_r = ins.pop() if has_mask else None
        wcond_r = ins.pop() if has_cond else None
        cond_r = ins.pop() if has_cond else None
        return base(dils_r, *ins, cond_r, wcond_r, mask_r, *tail)

    z_all, skip, x_final = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, L),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, t_dim, gch),
                    lambda b, l, *_: (b, l, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _row((t_dim, s)),
                _row((t_dim, c)),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, L, t_dim, gch), dt),
            jax.ShapeDtypeStruct((bsz, t_dim, s), jnp.float32),
            jax.ShapeDtypeStruct((bsz, t_dim, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(t_dim, has_cond)),
        interpret=interpret,
    )(dils, *args)
    return z_all, skip, x_final


def _bwd_call(lp, arch: ArchConfig, h0, cond, z_all, x_final, g_skip,
              interpret, tapcat=False, mask=None):
    L = len(arch.dilations)
    bsz, t_dim, c = h0.shape
    two_g = lp["w_cur"].shape[-1]
    gch = two_g // 2
    s = arch.skip_channels
    max_d = max(arch.dilations)
    dt = jnp.dtype(arch.compute_dtype)
    dils = jnp.asarray(arch.dilations, jnp.int32)

    def tr(x):
        return jnp.swapaxes(x, -1, -2)

    z_spec = pl.BlockSpec(                      # z of layer L-1-l
        (1, 1, t_dim, gch),
        lambda b, l, *_: (b, pl.num_programs(1) - 1 - l, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if tapcat:
        wcp = jnp.concatenate([lp["w_cur"], lp["w_prev"]], axis=1)
        in_specs = [
            _row((t_dim, s)), _row((t_dim, c)), z_spec,
            _lyr((2 * c, two_g), rev=True), _lyr((1, two_g), rev=True),
            _lyr((gch, c), rev=True), _lyr((1, c), rev=True),
            _lyr((two_g, c), rev=True), _lyr((two_g, c), rev=True),
            _lyr((c, gch), rev=True),
            _lyr((s, gch), rev=True),
        ]
        args = [
            g_skip, x_final, z_all,
            wcp, lp["b"][:, None, :],
            lp["w_res"], lp["b_res"][:, None, :],
            tr(lp["w_cur"]), tr(lp["w_prev"]),
            tr(lp["w_res"]),
            tr(lp["w_skip"]),
        ]
    else:
        in_specs = [
            _row((t_dim, s)), _row((t_dim, c)), z_spec,
            _lyr((c, two_g), rev=True), _lyr((c, two_g), rev=True),
            _lyr((1, two_g), rev=True),
            _lyr((gch, c), rev=True), _lyr((1, c), rev=True),
            _lyr((two_g, c), rev=True), _lyr((two_g, c), rev=True),
            _lyr((c, gch), rev=True),
            _lyr((s, gch), rev=True),
        ]
        args = [
            g_skip, x_final, z_all,
            lp["w_cur"], lp["w_prev"], lp["b"][:, None, :],
            lp["w_res"], lp["b_res"][:, None, :],
            tr(lp["w_cur"]), tr(lp["w_prev"]),
            tr(lp["w_res"]),
            tr(lp["w_skip"]),
        ]
    has_cond = cond is not None
    cc = lp["w_cond"].shape[1] if has_cond else 0
    if has_cond:
        in_specs += [
            _row((t_dim, cc)),
            _lyr((cc, two_g), rev=True),
            _lyr((two_g, cc), rev=True),
        ]
        args += [cond, lp["w_cond"], tr(lp["w_cond"])]
    has_mask = mask is not None
    if has_mask:
        in_specs += [_row((t_dim, 1))]
        args += [mask.astype(jnp.float32)[..., None]]

    if tapcat:
        tap_out_specs = [_whole((L, 2 * c, two_g))]
        tap_out_shape = [jax.ShapeDtypeStruct((L, 2 * c, two_g), jnp.float32)]
    else:
        tap_out_specs = [_whole((L, c, two_g)), _whole((L, c, two_g))]
        tap_out_shape = [
            jax.ShapeDtypeStruct((L, c, two_g), jnp.float32),
            jax.ShapeDtypeStruct((L, c, two_g), jnp.float32),
        ]
    out_specs = [
        _row((t_dim, c)),                       # dh0
        *tap_out_specs, _whole((L, 1, two_g)),
        _whole((L, gch, c)), _whole((L, 1, c)),
        _whole((L, gch, s)), _whole((L, 1, s)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, t_dim, c), jnp.float32),
        *tap_out_shape,
        jax.ShapeDtypeStruct((L, 1, two_g), jnp.float32),
        jax.ShapeDtypeStruct((L, gch, c), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((L, gch, s), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, s), jnp.float32),
    ]
    if has_cond:
        out_specs += [_row((t_dim, cc)), _whole((L, cc, two_g))]
        out_shape += [
            jax.ShapeDtypeStruct((bsz, t_dim, cc), jnp.float32),
            jax.ShapeDtypeStruct((L, cc, two_g), jnp.float32),
        ]

    if tapcat:
        scratch = [
            pltpu.VMEM((t_dim, c), jnp.float32),            # x_s
            pltpu.VMEM((t_dim, c), jnp.float32),            # dx_s
            pltpu.VMEM((t_dim + max_d, c), jnp.float32),    # stage_s (dproj)
            pltpu.VMEM((t_dim + max_d, 2 * c), jnp.float32),  # xcat_s
            pltpu.VMEM((L * 2 * c, two_g), jnp.float32),    # dwcp
            pltpu.VMEM((L, two_g), jnp.float32),            # db
            pltpu.VMEM((L * gch, c), jnp.float32),          # dwr
            pltpu.VMEM((L, c), jnp.float32),                # dbr
            pltpu.VMEM((L * gch, s), jnp.float32),          # dws
            pltpu.VMEM((L, s), jnp.float32),                # dbs
        ]
    else:
        scratch = [
            pltpu.VMEM((t_dim, c), jnp.float32),            # x_s
            pltpu.VMEM((t_dim, c), jnp.float32),            # dx_s
            pltpu.VMEM((t_dim + max_d, two_g), jnp.float32),  # stage_s
            pltpu.VMEM((t_dim + max_d, c), jnp.float32),    # stage2_s
            pltpu.VMEM((L * c, two_g), jnp.float32),        # dwc
            pltpu.VMEM((L * c, two_g), jnp.float32),        # dwp
            pltpu.VMEM((L, two_g), jnp.float32),            # db
            pltpu.VMEM((L * gch, c), jnp.float32),          # dwr
            pltpu.VMEM((L, c), jnp.float32),                # dbr
            pltpu.VMEM((L * gch, s), jnp.float32),          # dws
            pltpu.VMEM((L, s), jnp.float32),                # dbs
        ]
    if has_cond:
        scratch += [
            pltpu.VMEM((L * cc, two_g), jnp.float32),   # dwcond
            pltpu.VMEM((t_dim, cc), jnp.float32),       # dcond
        ]

    n_in = len(args)
    n_out = len(out_specs)
    base = functools.partial(
        _bwd_kernel_tc if tapcat else _bwd_kernel,
        compute_dtype=dt, n_layers=L, max_d=max_d,
    )

    def kernel(dils_r, *rest):
        ins = list(rest[:n_in])
        outs = list(rest[n_in:n_in + n_out])
        scr = list(rest[n_in + n_out:])
        mask_r = ins.pop() if has_mask else None
        if has_cond:
            wcondT_r = ins.pop()
            wcond_r = ins.pop()
            cond_r = ins.pop()
            dwcond_r = outs.pop()
            dcond_r = outs.pop()
            dcond_scr = scr.pop()
            dwcond_scr = scr.pop()
        else:
            cond_r = wcond_r = wcondT_r = None
            dcond_r = dwcond_r = None
            dcond_scr = dwcond_scr = None
        return base(
            dils_r, *ins, cond_r, wcond_r, wcondT_r, mask_r,
            *outs, dcond_r, dwcond_r, *scr, dwcond_scr, dcond_scr,
        )

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, L),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(t_dim, has_cond)),
        interpret=interpret,
    )(dils, *args)
    return outs


def make_fused_stack(arch: ArchConfig, has_cond: bool, interpret: bool = False,
                     tapcat: bool = False, has_mask: bool = False):
    """Build the custom-VJP fused stack for `arch`.

    Returns fn(lp_subset, h0, cond[, mask]) -> skip_sum where lp_subset is
    the layers dict (w_cur, w_prev, b, w_res, b_res, w_skip, b_skip[,
    w_cond]) and cond is the upsampled (B, T, Cc) conditioning (or a dummy
    zeros array when has_cond=False; it gets a zero gradient).

    tapcat: contract the two width-2 taps as ONE K=2C matmul on a VMEM
    [x | shift(x)] concat (full MXU depth at C=64 archs instead of two
    half-filled K=C ops; tap weight grads likewise merge to one M=2C
    contraction). Same math to rounding (one fused accumulation instead of
    xc + xp). Configured via TrainConfig.tapcat (on in the production
    configs; ~0.7% measured win — docs/kernels.md).

    has_mask: the fn takes a 4th (B, T) float mask argument — the
    sequence-parallel residual-stream mask (parallel/halo.py): masked rows
    stay exactly zero through the stack (h0 must arrive pre-masked, as
    input_frontend does). The mask is a structural input, not a
    differentiable one (its cotangent is zero). mask=ones is bitwise
    identical to the unmasked kernel.
    """

    def _fwd_res(lp, h0, cond, mask):
        z_all, skip, x_final = _fwd_call(
            lp, arch, h0, cond if has_cond else None, interpret, tapcat,
            mask,
        )
        return z_all, skip, x_final

    def _bwd_impl(res, g_skip):
        lp, h0, cond, mask, z_all, x_final = res
        outs = _bwd_call(
            lp, arch, h0, cond if has_cond else None, z_all, x_final,
            g_skip, interpret, tapcat, mask,
        )
        if tapcat:
            c = h0.shape[-1]
            if has_cond:
                (dh0, dwcp, db, dwr, dbr, dws, dbs, dcond, dwcond) = outs
            else:
                (dh0, dwcp, db, dwr, dbr, dws, dbs) = outs
                dcond = jnp.zeros_like(cond)
            dwc, dwp = dwcp[:, :c], dwcp[:, c:]
        elif has_cond:
            (dh0, dwc, dwp, db, dwr, dbr, dws, dbs, dcond, dwcond) = outs
        else:
            (dh0, dwc, dwp, db, dwr, dbr, dws, dbs) = outs
            dcond = jnp.zeros_like(cond)
        dlp = dict(
            w_cur=dwc,
            w_prev=dwp,
            b=db[:, 0, :],
            w_res=dwr,
            b_res=dbr[:, 0, :],
            w_skip=dws,
            b_skip=dbs[:, 0, :],
        )
        if has_cond:
            dlp["w_cond"] = dwcond
        # Gradients for any extra keys in lp (e.g. w_gcond folded upstream).
        for k in lp:
            if k not in dlp:
                dlp[k] = jnp.zeros_like(lp[k])
        return dlp, dh0, dcond

    if has_mask:
        @jax.custom_vjp
        def fused(lp, h0, cond, mask):
            _, skip, _ = _fwd_res(lp, h0, cond, mask)
            return skip

        def fwd(lp, h0, cond, mask):
            z_all, skip, x_final = _fwd_res(lp, h0, cond, mask)
            return skip, (lp, h0, cond, mask, z_all, x_final)

        def bwd(res, g_skip):
            dlp, dh0, dcond = _bwd_impl(res, g_skip)
            return dlp, dh0, dcond, jnp.zeros_like(res[3])

        fused.defvjp(fwd, bwd)
        return fused

    @jax.custom_vjp
    def fused(lp, h0, cond):
        _, skip, _ = _fwd_res(lp, h0, cond, None)
        return skip

    def fwd(lp, h0, cond):
        # x_final comes straight from the kernel's VMEM residual stream —
        # a (B, T, C) write. (It was previously reconstructed with an XLA
        # einsum over the whole (B, L, T, G) z_all tensor: an extra L*G/C
        # ~ 30x HBM read per step, measured ~7% of the train step.)
        z_all, skip, x_final = _fwd_res(lp, h0, cond, None)
        return skip, (lp, h0, cond, None, z_all, x_final)

    def bwd(res, g_skip):
        return _bwd_impl(res, g_skip)

    fused.defvjp(fwd, bwd)
    return fused
