"""Fused input-frontend kernels: one-hot MXU embedding + width-K causal
input conv (fwd + custom-VJP bwd).

VERDICT r2 item 1, final tail component: after the fused post+CE kernel
(post_loss.py) and the one-hot embedding gradient (mm_embed_grad), the
re-profiled training step (docs/kernels.md round-3 section) still carries
~1.0 ms/step of XLA tail, most of it the frontend — the embed gather
fusion, the width-K tap matmuls, and the embedding-grad chunked scan with
its weight-layout staging copies. These kernels collapse that machinery
into one tight kernel per pass:

  Forward — grid (B, nT) tiles over time: per tile build the (Tt+K-1, Q)
  one-hot in VMEM from the class row (history rows included, so the causal
  shift never crosses a tile boundary), one (Tt+K-1, Q) @ (Q, C) MXU
  contraction replaces the gather, then K shifted (Tt, C) @ (C, C) tap
  matmuls accumulate h0 = b + sum_k e[t-(K-1-k)] @ w[k]. Positions before
  t=0 use a sentinel class Q whose one-hot row is all-zero — exactly the
  zero-embedding padding of the XLA path's shift_right.

  Exactness: for bf16 compute dtypes the default-precision one-hot
  contraction yields exactly bf16(embed[x]) accumulated in f32 — the SAME
  operand the XLA path's tap matmul consumes after its cast — and the tap
  contraction replicates the XLA sum order (b + ((tap_0 + tap_1) + ...)),
  so the fused forward is BIT-EXACT vs input_frontend (tested). For f32
  compute the one-hot contraction runs at HIGHEST precision (one-hot
  entries are exact 0/1, so the product is exact to f32 rounding — the
  mm_embed_grad argument, models/wavenet.py).

  Backward — same grid: recompute the one-hot and e per tile, accumulate
  d_w[k] += e_k^T @ dh and db += sum(dh) in VMEM scratch, form
  d_e = sum_k pad_k(dh @ w[k]^T), and accumulate d_embed += onehot^T @ d_e
  (HIGHEST precision f32: the transpose contraction against exact 0/1
  entries reproduces the scatter-add to f32 rounding). All three gradients
  live in VMEM scratch across the whole grid and are written once at the
  final step — the XLA-side scan, its (Q, C) layout copies, and the
  (B, T, C) one-hot intermediates all disappear.

The sequence-parallel input_mask (parallel/halo.py) is supported in both
passes (e and h0 rows re-masked exactly like input_frontend; the halo mask
is binary, so the multiply is exact in any order).

Opt-in via TrainConfig.fused_frontend (production configs; subsumes
mm_embed_grad when enabled).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024


def _pick_tile(t_dim: int) -> int:
    if t_dim >= _TILE:
        return _TILE
    return max(128, 1 << int(np.ceil(np.log2(max(t_dim, 2)))))


def _onehot(classes_col, q):
    """(N, 1) int32 -> (N, Q) f32 one-hot; sentinel class q -> all-zero."""
    n = classes_col.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, q), 1)
    return (col == classes_col).astype(jnp.float32)


def _fwd_kernel(
    x_ref,                     # (1, t_all, 1) int32 padded class row
    m_ref,                     # (1, t_all, 1) f32 mask row (or None)
    emb_ref,                   # (Q, C)
    w_ref,                     # (K, C, C)
    b_ref,                     # (1, C)
    h_ref,                     # out (1, Tt, C) f32
    *,
    compute_dtype,
    k_taps: int,
    tile: int,
):
    i = pl.program_id(1)
    dt = compute_dtype
    q = emb_ref.shape[0]
    n = tile + k_taps - 1
    xt = x_ref[0, pl.dslice(i * tile, n), :]          # (n, 1)
    oh = _onehot(xt, q)
    # Exact-selection contraction: DEFAULT precision already yields exactly
    # bf16(embed[x]) for bf16 compute (the operand the taps consume); f32
    # compute needs HIGHEST so e == embed[x] to f32 rounding.
    prec = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    e = jax.lax.dot_general(
        oh, emb_ref[:], (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )                                                  # (n, C) f32
    m_full = None
    if m_ref is not None:
        # One ALIGNED load (start = i*tile); the K-1-offset h-row mask is a
        # static in-value slice of it.
        m_full = m_ref[0, pl.dslice(i * tile, n), :]
        e = e * m_full
    acc = None
    for k in range(k_taps):
        part = jax.lax.dot_general(
            e[k : k + tile].astype(dt), w_ref[k].astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    h = b_ref[0].astype(jnp.float32) + acc
    if m_full is not None:
        h = h * m_full[k_taps - 1 :]
    h_ref[0] = h


def _bwd_kernel(
    x_ref, m_ref,              # padded class / mask rows as in fwd
    emb_ref,                   # (Q, C)
    wT_ref,                    # (K, C, C): compute-dtype-rounded w[k]^T
    dh_ref,                    # (1, Tt, C) f32 cotangent of h0
    demb_ref, dw_ref, db_ref,  # outs (Q, C) (K, C, C) (1, C)
    demb_s, dw_s, db_s,        # scratch, same shapes
    *,
    compute_dtype,
    k_taps: int,
    tile: int,
):
    b_id = pl.program_id(0)
    i = pl.program_id(1)
    dt = compute_dtype
    q = emb_ref.shape[0]
    c = emb_ref.shape[1]
    n = tile + k_taps - 1

    @pl.when(jnp.logical_and(b_id == 0, i == 0))
    def _():
        demb_s[:] = jnp.zeros_like(demb_s)
        dw_s[:] = jnp.zeros_like(dw_s)
        db_s[:] = jnp.zeros_like(db_s)

    xt = x_ref[0, pl.dslice(i * tile, n), :]
    oh = _onehot(xt, q)
    prec = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    e = jax.lax.dot_general(
        oh, emb_ref[:], (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    m_full = None
    if m_ref is not None:
        m_full = m_ref[0, pl.dslice(i * tile, n), :]
        e = e * m_full
    g = dh_ref[0]                                       # (Tt, C) f32
    if m_full is not None:
        g = g * m_full[k_taps - 1 :]
    db_s[:] = db_s[:] + jnp.sum(g, axis=0, keepdims=True)
    # d_e accumulated over taps at each tap's shifted offset; zero rows
    # concatenated statically (Mosaic supports concat, not lax.pad).
    # Operand VALUES mirror the XLA VJP exactly: e is bf16-valued f32
    # (the tap dot's cast input), g stays f32, wT arrives pre-rounded to
    # the compute dtype (the caller casts) — so CPU interpret parity with
    # the XLA frontend grads is tight, and on TPU the default-precision
    # f32 dot is the same single-MXU-pass the bf16 one would be.
    de = None
    for k in range(k_taps):
        dw_s[k] = dw_s[k] + jax.lax.dot_general(
            e[k : k + tile], g,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # XLA's cotangent of the cast tap operand has the PRIMAL's dtype:
        # each d_e piece is rounded to the compute dtype before the f32
        # tap-sum — replicated here so d_embed matches the XLA frontend
        # grads element-exactly (row-wise dots are tile-independent).
        piece = jax.lax.dot_general(
            g, wT_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt).astype(jnp.float32)                # (Tt, C)
        if k_taps > 1:
            parts = []
            if k > 0:
                parts.append(jnp.zeros((k, c), jnp.float32))
            parts.append(piece)
            if k_taps - 1 - k > 0:
                parts.append(jnp.zeros((k_taps - 1 - k, c), jnp.float32))
            piece = jnp.concatenate(parts, axis=0)
        de = piece if de is None else de + piece        # (n, C)
    if m_ref is not None:
        de = de * m_full
    # Scatter-add equivalent: one-hot transpose contraction at HIGHEST
    # (exact 0/1 entries -> exact to f32 rounding; mm_embed_grad argument).
    demb_s[:] = demb_s[:] + jax.lax.dot_general(
        oh, de, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    last = jnp.logical_and(
        b_id == pl.num_programs(0) - 1, i == pl.num_programs(1) - 1
    )

    @pl.when(last)
    def _():
        demb_ref[:] = demb_s[:]
        # d_w stays an unrounded f32 tile-sum (the XLA path's cotangent is
        # bf16-rounded — ours is strictly more accurate; parity tests allow
        # the resulting <=1-bf16-ulp difference on this one gradient).
        dw_ref[:] = dw_s[:]
        db_ref[:] = db_s[:]


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret")
)
def fused_frontend(
    embed: jnp.ndarray,        # (Q, C) f32
    conv: dict,                # {"w": (K, C, C), "b": (C,)}
    x_classes: jnp.ndarray,    # (B, T) int32
    input_mask=None,           # (B, T) or None
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
):
    """input_frontend (models/wavenet.py) as a fused kernel pair.

    Returns h0 (B, T, C) f32; differentiable in (embed, conv) via the
    Pallas backward kernel. Bit-exact vs the XLA path for bf16 compute
    dtypes (see module docstring); classes/mask get zero cotangents.
    """
    bsz, t_dim = x_classes.shape
    q, c = embed.shape
    w = conv["w"]
    k_taps = w.shape[0]
    dt = jnp.dtype(compute_dtype)
    tile = _pick_tile(t_dim)
    n_tiles = -(-t_dim // tile)
    t_pad = n_tiles * tile
    t_all = t_pad + k_taps - 1

    # Padded class row: K-1 sentinel rows (class q -> zero embedding, the
    # causal left padding) + classes + sentinel tail to the tile multiple.
    xp = jnp.full((bsz, t_all), q, jnp.int32)
    xp = jax.lax.dynamic_update_slice(
        xp, x_classes.astype(jnp.int32), (0, k_taps - 1)
    )[..., None]
    has_mask = input_mask is not None
    if has_mask:
        mp = jnp.zeros((bsz, t_all), jnp.float32)
        mp = jax.lax.dynamic_update_slice(
            mp, input_mask.astype(jnp.float32), (0, k_taps - 1)
        )[..., None]

    row_spec = pl.BlockSpec(
        (1, t_all, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    h_spec = pl.BlockSpec(
        (1, tile, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )

    def run_fwd(emb, cw, cb, xp_, mp_):
        in_specs = [row_spec]
        args = [xp_]
        if has_mask:
            in_specs += [row_spec]
            args += [mp_]
        in_specs += [whole((q, c)), whole((k_taps, c, c)), whole((1, c))]
        args += [emb, cw, cb[None, :]]
        (h,) = pl.pallas_call(
            functools.partial(
                _fwd_kernel_entry, compute_dtype=dt, k_taps=k_taps,
                tile=tile, has_mask=has_mask,
            ),
            grid=(bsz, n_tiles),
            in_specs=in_specs,
            out_specs=[h_spec],
            out_shape=[jax.ShapeDtypeStruct((bsz, t_pad, c), jnp.float32)],
            interpret=interpret,
        )(*args)
        return h

    def run_bwd(emb, cw, cb, xp_, mp_, dh):
        in_specs = [row_spec]
        args = [xp_]
        if has_mask:
            in_specs += [row_spec]
            args += [mp_]
        in_specs += [whole((q, c)), whole((k_taps, c, c))]
        # wT carries the VALUES the XLA VJP contracts against: the
        # compute-dtype-rounded taps, widened back to f32 (identity for
        # f32 compute).
        args += [
            emb, jnp.swapaxes(cw, 1, 2).astype(dt).astype(jnp.float32),
        ]
        in_specs += [
            pl.BlockSpec(
                (1, tile, c), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        args += [dh]
        outs = pl.pallas_call(
            functools.partial(
                _bwd_kernel_entry, compute_dtype=dt, k_taps=k_taps,
                tile=tile, has_mask=has_mask,
            ),
            grid=(bsz, n_tiles),
            in_specs=in_specs,
            out_specs=[
                whole((q, c)), whole((k_taps, c, c)), whole((1, c)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((q, c), jnp.float32),
                jax.ShapeDtypeStruct((k_taps, c, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((q, c), jnp.float32),
                pltpu.VMEM((k_taps, c, c), jnp.float32),
                pltpu.VMEM((1, c), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
        demb, dw, db = outs
        return demb, dw, db[0]

    @jax.custom_vjp
    def f(emb, cw, cb, xp_, mp_):
        return run_fwd(emb, cw, cb, xp_, mp_)

    def f_fwd(emb, cw, cb, xp_, mp_):
        return run_fwd(emb, cw, cb, xp_, mp_), (emb, cw, cb, xp_, mp_)

    def f_bwd(res, dh):
        emb, cw, cb, xp_, mp_ = res
        demb, dw, db = run_bwd(emb, cw, cb, xp_, mp_, dh)
        return (
            demb, dw, db,
            np.zeros(xp_.shape, jax.dtypes.float0),
            # Hard-zero mask cotangent is CORRECT by contract: the mask is
            # structural and stop_gradient'ed at every call site
            # (models/wavenet.input_frontend / forward — ADVICE r3), so the
            # XLA and fused paths agree on a zero mask gradient.
            None if mp_ is None else jnp.zeros_like(mp_),
        )

    f.defvjp(f_fwd, f_bwd)
    h = f(embed, w, conv["b"], xp, mp if has_mask else None)
    return h[:, :t_dim]


def _fwd_kernel_entry(*refs, compute_dtype, k_taps, tile, has_mask):
    if has_mask:
        (x_ref, m_ref, emb_ref, w_ref, b_ref, h_ref) = refs
    else:
        (x_ref, emb_ref, w_ref, b_ref, h_ref) = refs
        m_ref = None
    return _fwd_kernel(
        x_ref, m_ref, emb_ref, w_ref, b_ref, h_ref,
        compute_dtype=compute_dtype, k_taps=k_taps, tile=tile,
    )


def _bwd_kernel_entry(*refs, compute_dtype, k_taps, tile, has_mask):
    if has_mask:
        (x_ref, m_ref, emb_ref, wT_ref, dh_ref,
         demb_ref, dw_ref, db_ref, demb_s, dw_s, db_s) = refs
    else:
        (x_ref, emb_ref, wT_ref, dh_ref,
         demb_ref, dw_ref, db_ref, demb_s, dw_s, db_s) = refs
        m_ref = None
    return _bwd_kernel(
        x_ref, m_ref, emb_ref, wT_ref, dh_ref,
        demb_ref, dw_ref, db_ref, demb_s, dw_s, db_s,
        compute_dtype=compute_dtype, k_taps=k_taps, tile=tile,
    )
