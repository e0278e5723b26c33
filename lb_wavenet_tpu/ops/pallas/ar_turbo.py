"""Turbo AR kernel: the ENTIRE sample step in one pallas_call.

Extends ops/pallas/ar_step.py by folding the post-network, Gumbel-max
categorical sampling (TPU-native PRNG), the next sample's embedding lookup
(one-hot matmul) and the next step's causal input conv into the final grid
iteration of the same kernel. The lax.scan body is then a single kernel
launch with NO XLA ops between steps — the per-step floor is one kernel
dispatch plus the stack math itself.

Sampling note: by DEFAULT the turbo engine samples from the stateless
per-lane counter hash over (lane_seed, lane-local time, class) — THE SAME
function as generate.perlane_gumbel and ar_mega._perlane_bits, so turbo
sampled streams are platform-independent (CPU interpret == TPU), consume
noise identically to the mega engine, and are replayable per lane
(generate.derive_lane_seeds). The opt-out global chain (global_rng=True)
draws from the TPU-native PRNG (`pltpu.prng_seed`/`prng_random_bits`),
whose streams differ from the XLA engine's threefry draws. Deterministic
paths — teacher forcing and temperature=0 greedy — are bit-identical to
the other engines regardless (tested). Use the `pallas` engine when a
stream must bit-match the XLA engine's threefry RNG chain.
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
    seed_ref,                     # (2,) int32 [per-step PRNG seed, t_abs]
    # inputs
    h0_ref,                       # (B, C) residual input of this step
    tap_ref,                      # (1, B, C)
    wc_ref, wp_ref, b_ref,        # (1,C,2G) (1,C,2G) (1,1,2G)
    wr_ref, br_ref,               # (1,G,C) (1,1,C)
    ws_ref, bs_ref,               # (1,G,S) (1,1,S)
    w1_ref, b1_ref,               # (S,S) (1,S)
    w2_ref, b2_ref,               # (S,Q) (1,Q)
    embed_ref,                    # (Q, C)
    wcur_ref, bin_ref,            # (C,C) current input-conv tap w[K-1], (1,C)
    forced_ref,                   # (B, 1) int32, -1 = sample freely
    cond_ref,                     # (B, Cc) or None
    wcond_ref,                    # (1, Cc, 2G) or None
    lane_ref,                     # (B, 2|3) int32 [seed, lease t0,
                                  #  f32(1/tau) bits] or None
    wpast_ref,                    # (K-1, C, C) past taps w[0..K-2] or None
    estack_ref,                   # (K-1, B, C) e(t-K+2)..e(t), or None (K=1)
    # outputs
    newtap_ref,                   # (1, B, C) aliased ring slot
    class_ref,                    # (B, 1) int32 sampled class
    h0next_ref,                   # (B, C) f32 next step's residual input
    newstack_ref,                 # (K-1, B, C) shifted stack, or None
    logits_ref,                   # (B, Q) f32 pre-sampling logits, or None
    # scratch
    h_s, skip_s,
    *,
    compute_dtype,
    n_layers: int,
    k_taps: int,
    temperature: float,
    use_hw_prng: bool = True,
    per_lane: bool = False,
    lane_temp: bool = False,
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
        if logits_ref is not None:
            logits_ref[:] = logits

        def _mix(x):
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            return x ^ (x >> 16)

        if temperature > 0.0:
            if per_lane:
                # Per-lane counter hash (the default sampling path):
                # bit-identical to generate.perlane_gumbel's bit stage and
                # to ar_mega._perlane_bits — a lane's noise depends only on
                # (lane_seed, t_abs - lease_t0, class), independent of the
                # batch width, lane position, engine, and platform PRNG.
                s = lane_ref[:, 0:1].astype(jnp.uint32)                # (B, 1)
                tl = (
                    seed_ref[1] - lane_ref[:, 1:2]
                ).astype(jnp.uint32)                                   # (B, 1)
                qi = jax.lax.broadcasted_iota(jnp.uint32, (bsz, q), 1)
                bits = _mix(
                    s + tl * jnp.uint32(0x9E3779B9)
                    + qi * jnp.uint32(0x7FEB352D)
                )
            elif use_hw_prng:
                pltpu.prng_seed(seed_ref[0])
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((bsz, q)), jnp.uint32
                )
            else:
                # Interpret-mode (CPU) fallback for the GLOBAL chain —
                # pltpu.prng_* has no CPU lowering. Streams differ from the
                # TPU PRNG; deterministic paths are unaffected.
                ctr = (
                    jax.lax.broadcasted_iota(jnp.uint32, (bsz, q), 0) * q
                    + jax.lax.broadcasted_iota(jnp.uint32, (bsz, q), 1)
                )
                bits = _mix(
                    seed_ref[0].astype(jnp.uint32)
                    + ctr * jnp.uint32(0x9E3779B9)
                )
            # 24-bit mantissa-exact uniform in (0, 1) -> Gumbel(0,1).
            # Mosaic has no uint32->f32 cast; the 24-bit value is positive,
            # so bitcast to int32 first.
            top24 = pltpu.bitcast(
                jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
            )
            u = (top24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
            gum = -jnp.log(-jnp.log(u))
            if lane_temp:
                # Per-lane inverse temperature (serving): row 2 of the lane
                # block carries host-computed f32(1/tau) bits; inv == 0 is
                # a greedy lane (raw-logits argmax, bit-matching a
                # dedicated greedy session).
                inv = pltpu.bitcast(lane_ref[:, 2:3], jnp.float32)  # (B, 1)
                scores = jnp.where(inv > 0.0, logits * inv + gum, logits)
            else:
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
        # Width-K causal input conv for the NEXT step: current tap on
        # e_next plus the K-1 carried past embeddings (oldest first); the
        # stack shifts left and appends e_next. K=2 reduces to the classic
        # two-matmul form with identical addition order (bit-exact).
        h0n = bin_ref[0] + mm(e_next, wcur_ref[:])
        if k_taps > 1:
            for j in range(k_taps - 1):
                h0n = h0n + mm(estack_ref[j], wpast_ref[j])
            for j in range(k_taps - 2):
                newstack_ref[j] = estack_ref[j + 1]
            newstack_ref[k_taps - 2] = e_next
        h0next_ref[:] = h0n


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "temperature", "has_cond", "interpret", "emit_logits",
    ),
)
def turbo_step(
    params: dict,
    lp: dict,
    arch: ArchConfig,
    h0: jnp.ndarray,
    estack: jnp.ndarray,          # (K-1, B, C) carried input-conv embeddings
    bufs: jnp.ndarray,
    slots: jnp.ndarray,
    seed: jnp.ndarray,            # (2,) int32 [per-step seed, t_abs]
    forced_t: jnp.ndarray,        # (B, 1) int32
    cond_t: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    has_cond: bool = False,
    interpret: bool = False,
    lane: Optional[jnp.ndarray] = None,  # (2, B) int32 [seeds; lease times]
    emit_logits: bool = False,
):
    L = len(arch.dilations)
    b, c = h0.shape
    k_taps = arch.input_kernel
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
        whole((c, c)), whole((1, c)),         # input conv: w[K-1], bias
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
        w_in[k_taps - 1], params["input_conv"]["b"][None, :],
        forced_t,
    ]
    if has_cond:
        cc = lp["w_cond"].shape[1]
        in_specs += [whole((b, cc)), layer_block((cc, two_g))]
        args += [cond_t, lp["w_cond"]]
    per_lane = lane is not None
    if per_lane:
        in_specs += [whole((b, lane.shape[0]))]
        args += [jnp.swapaxes(lane, 0, 1)]  # batch-major for this kernel
    if k_taps > 1:
        in_specs += [
            whole((k_taps - 1, c, c)), whole((k_taps - 1, b, c)),
        ]
        args += [w_in[: k_taps - 1], estack.astype(jnp.float32)]

    base = functools.partial(
        _turbo_kernel,
        compute_dtype=dt,
        n_layers=L,
        k_taps=k_taps,
        temperature=temperature,
        use_hw_prng=not interpret,
        per_lane=per_lane,
        lane_temp=per_lane and lane.shape[0] == 3,
    )
    n_in = len(args)

    def kernel(slots_r, seed_r, *rest):
        ins = list(rest[:n_in])
        tail = list(rest[n_in:])  # outputs + scratch
        estack_r = ins.pop() if k_taps > 1 else None
        wpast_r = ins.pop() if k_taps > 1 else None
        lane_r = ins.pop() if per_lane else None
        wcond_r = ins.pop() if has_cond else None
        cond_r = ins.pop() if has_cond else None
        h_s, skip_s = tail[-2:]
        outs_t = tail[:-2]
        newtap, cls_o, h0n_o = outs_t[:3]
        rest_o = list(outs_t[3:])
        newstack = rest_o.pop(0) if k_taps > 1 else None
        logits_o = rest_o.pop(0) if emit_logits else None
        return base(
            slots_r, seed_r, *ins, cond_r, wcond_r, lane_r,
            wpast_r, estack_r, newtap, cls_o, h0n_o, newstack, logits_o,
            h_s, skip_s,
        )

    out_specs = [tap_spec, whole((b, 1)), whole((b, c))]
    out_shape = [
        jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, c), jnp.float32),
    ]
    if k_taps > 1:
        out_specs.append(whole((k_taps - 1, b, c)))
        out_shape.append(
            jax.ShapeDtypeStruct((k_taps - 1, b, c), jnp.float32)
        )
    if emit_logits:
        out_specs.append(whole((b, q)))
        out_shape.append(jax.ShapeDtypeStruct((b, q), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((b, c), jnp.float32),
                pltpu.VMEM((b, s), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        # call operands: slots(0), seed(1), h0(2), bufs(3), ...
        input_output_aliases={3: 0},
        interpret=interpret,
    )(slots, seed, *args)
    outs = list(outs)
    new_bufs, cls, h0_next = outs[:3]
    rest = outs[3:]
    new_stack = (
        rest.pop(0) if k_taps > 1
        else estack  # (0, B, C): structural placeholder
    )
    logits = rest.pop(0) if emit_logits else None
    if emit_logits:
        return new_bufs, cls[:, 0], new_stack, h0_next, logits
    return new_bufs, cls[:, 0], new_stack, h0_next
