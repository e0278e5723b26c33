"""Turbo AR kernel: the ENTIRE sample step in one pallas_call.

Extends ops/pallas/ar_step.py by folding the post-network, Gumbel-max
categorical sampling (TPU-native PRNG), the next sample's embedding lookup
(one-hot matmul) and the next step's causal input conv into the final grid
iteration of the same kernel. The lax.scan body is then a single kernel
launch with NO XLA ops between steps — the per-step floor is one kernel
dispatch plus the stack math itself.

Sampling note: the turbo engine draws randomness from the TPU-native PRNG
(`pltpu.prng_seed` / `prng_random_bits`, Gumbel-max trick), so its sampled
streams differ from the XLA engine's threefry categorical draws; its
deterministic paths — teacher forcing and temperature=0 greedy — are
bit-identical to the other engines (tested). Use the `pallas` engine when a
stream must bit-match the XLA engine's RNG chain.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ArchConfig


def _turbo_kernel(
    # scalar prefetch
    slots_ref,                    # (L,) int32
    seed_ref,                     # (1,) int32 per-step PRNG seed
    # inputs
    h0_ref,                       # (B, C) residual input of this step
    tap_ref,                      # (1, B, C)
    wc_ref, wp_ref, b_ref,        # (1,C,2G) (1,C,2G) (1,1,2G)
    wr_ref, br_ref,               # (1,G,C) (1,1,C)
    ws_ref, bs_ref,               # (1,G,S) (1,1,S)
    w1_ref, b1_ref,               # (S,S) (1,S)
    w2_ref, b2_ref,               # (S,Q) (1,Q)
    embed_ref,                    # (Q, C)
    win0_ref, win1_ref, bin_ref,  # (C,C) (C,C) (1,C) input conv taps t-1, t
    ecur_ref,                     # (B, C) this step's input embedding e(t)
    forced_ref,                   # (B, 1) int32, -1 = sample freely
    cond_ref,                     # (B, Cc) or None
    wcond_ref,                    # (1, Cc, 2G) or None
    # outputs
    newtap_ref,                   # (1, B, C) aliased ring slot
    class_ref,                    # (B, 1) int32 sampled class
    enext_ref,                    # (B, C) f32 embedding of sampled class
    h0next_ref,                   # (B, C) f32 next step's residual input
    # scratch
    h_s, skip_s,
    *,
    compute_dtype,
    n_layers: int,
    temperature: float,
    use_hw_prng: bool = True,
):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        h_s[:] = h0_ref[:]
        skip_s[:] = jnp.zeros_like(skip_s)

    dt = compute_dtype

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt),
            w.astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    h = h_s[:]
    newtap_ref[0] = h.astype(newtap_ref.dtype)
    pre = mm(h, wc_ref[0]) + mm(tap_ref[0].astype(jnp.float32), wp_ref[0]) + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[:], wcond_ref[0])
    g = pre.shape[-1] // 2
    z = jnp.tanh(pre[:, :g]) * jax.nn.sigmoid(pre[:, g:])
    h_s[:] = h + mm(z, wr_ref[0]) + br_ref[0, 0]
    skip_s[:] = skip_s[:] + mm(z, ws_ref[0]) + bs_ref[0, 0]

    @pl.when(l == n_layers - 1)
    def _finale():
        bsz = h_s.shape[0]
        hidden = jax.nn.relu(mm(jax.nn.relu(skip_s[:]), w1_ref[:]) + b1_ref[0])
        logits = mm(hidden, w2_ref[:]) + b2_ref[0]  # (B, Q) f32
        q = logits.shape[-1]

        if temperature > 0.0:
            if use_hw_prng:
                pltpu.prng_seed(seed_ref[0])
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((bsz, q)), jnp.uint32
                )
            else:
                # Interpret-mode (CPU) fallback: splitmix32 counter hash —
                # pltpu.prng_* has no CPU lowering. Streams differ from the
                # TPU PRNG; deterministic paths are unaffected.
                ctr = (
                    jax.lax.broadcasted_iota(jnp.uint32, (bsz, q), 0) * q
                    + jax.lax.broadcasted_iota(jnp.uint32, (bsz, q), 1)
                )
                x = seed_ref[0].astype(jnp.uint32) + ctr * jnp.uint32(0x9E3779B9)
                x = x ^ (x >> 16)
                x = x * jnp.uint32(0x85EBCA6B)
                x = x ^ (x >> 13)
                x = x * jnp.uint32(0xC2B2AE35)
                bits = x ^ (x >> 16)
            # 24-bit mantissa-exact uniform in (0, 1) -> Gumbel(0,1).
            # Mosaic has no uint32->f32 cast; the 24-bit value is positive,
            # so bitcast to int32 first.
            top24 = pltpu.bitcast(
                jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
            )
            u = (top24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
            gum = -jnp.log(-jnp.log(u))
            scores = logits * (1.0 / temperature) + gum
        else:
            scores = logits

        # First-max argmax (== jnp.argmax tie semantics): smallest index
        # among the maxima.
        m = jnp.max(scores, axis=-1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, (bsz, q), 1)
        cls = jnp.min(
            jnp.where(scores >= m, col, jnp.int32(q)), axis=-1
        ).astype(jnp.int32)
        forced = forced_ref[:, 0]
        cls = jnp.where(forced >= 0, forced, cls)
        class_ref[:, 0] = cls

        onehot = (col[:, :] == cls[:, None]).astype(jnp.float32)
        e_next = mm(onehot, embed_ref[:])  # (B, C)
        enext_ref[:] = e_next
        h0next_ref[:] = (
            bin_ref[0] + mm(e_next, win1_ref[:]) + mm(ecur_ref[:], win0_ref[:])
        )


@functools.partial(
    jax.jit,
    static_argnames=("arch", "temperature", "has_cond", "interpret"),
)
def turbo_step(
    params: dict,
    lp: dict,
    arch: ArchConfig,
    h0: jnp.ndarray,
    e_cur: jnp.ndarray,
    bufs: jnp.ndarray,
    slots: jnp.ndarray,
    seed: jnp.ndarray,            # (1,) int32
    forced_t: jnp.ndarray,        # (B, 1) int32
    cond_t: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    has_cond: bool = False,
    interpret: bool = False,
):
    L = len(arch.dilations)
    b, c = h0.shape
    two_g = lp["w_cur"].shape[-1]
    gch = two_g // 2
    s = arch.skip_channels
    q = arch.quant_channels
    dt = jnp.dtype(arch.compute_dtype)
    pp = params["post"]

    def layer_block(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda l, slots, seed: (l,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape,
            lambda l, slots, seed: (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    tap_spec = pl.BlockSpec(
        (1, b, c), lambda l, slots, seed: (slots[l], 0, 0),
        memory_space=pltpu.VMEM,
    )

    in_specs = [
        whole((b, c)),                        # h0
        tap_spec,
        layer_block((c, two_g)),              # w_cur
        layer_block((c, two_g)),              # w_prev
        layer_block((1, two_g)),              # b
        layer_block((gch, c)),                # w_res
        layer_block((1, c)),                  # b_res
        layer_block((gch, s)),                # w_skip
        layer_block((1, s)),                  # b_skip
        whole((s, s)), whole((1, s)),         # post w1/b1
        whole((s, q)), whole((1, q)),         # post w2/b2
        whole((q, c)),                        # embed
        whole((c, c)), whole((c, c)), whole((1, c)),  # input conv
        whole((b, c)),                        # e_cur
        whole((b, 1)),                        # forced
    ]
    w_in = params["input_conv"]["w"]
    args = [
        h0,
        bufs,
        lp["w_cur"], lp["w_prev"], lp["b"][:, None, :],
        lp["w_res"], lp["b_res"][:, None, :],
        lp["w_skip"], lp["b_skip"][:, None, :],
        pp["w1"], pp["b1"][None, :],
        pp["w2"], pp["b2"][None, :],
        params["embed"],
        w_in[0], w_in[1], params["input_conv"]["b"][None, :],
        e_cur,
        forced_t,
    ]
    if has_cond:
        cc = lp["w_cond"].shape[1]
        in_specs += [whole((b, cc)), layer_block((cc, two_g))]
        args += [cond_t, lp["w_cond"]]
        kernel = functools.partial(
            _turbo_kernel,
            compute_dtype=dt,
            n_layers=L,
            temperature=temperature,
            use_hw_prng=not interpret,
        )
    else:
        def kernel(slots, seed, h0r, tap, wc, wp, bb, wr, br, ws, bs,
                   w1, b1, w2, b2, emb, wi0, wi1, bi, ec, fr,
                   newtap, cls, en, hn, h_s, skip_s):
            return _turbo_kernel(
                slots, seed, h0r, tap, wc, wp, bb, wr, br, ws, bs,
                w1, b1, w2, b2, emb, wi0, wi1, bi, ec, fr,
                None, None,
                newtap, cls, en, hn, h_s, skip_s,
                compute_dtype=dt, n_layers=L, temperature=temperature,
                use_hw_prng=not interpret,
            )

    new_bufs, cls, e_next, h0_next = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L,),
            in_specs=in_specs,
            out_specs=[
                tap_spec,
                whole((b, 1)),
                whole((b, c)),
                whole((b, c)),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, c), jnp.float32),
                pltpu.VMEM((b, s), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
        # call operands: slots(0), seed(1), h0(2), bufs(3), ...
        input_output_aliases={3: 0},
        interpret=interpret,
    )(slots, seed, *args)
    return new_bufs, cls[:, 0], e_next, h0_next
