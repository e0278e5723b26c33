"""Mega AR kernel: the ENTIRE batched generation loop in ONE pallas_call.

The turbo kernel (ar_turbo.py) still pays per-sample-step costs: a pallas
launch, scan bookkeeping, and a fresh 30-step layer-grid pipeline whose
per-iteration overhead (~1.5 us x L) dominates the tiny per-layer matmuls.
This kernel removes all of it:

  * grid = (T,) over SAMPLES. The TPU grid is sequential, so the carries
    (residual stream h, current embedding e) live in VMEM scratch across
    steps; ALL weights are fetched into VMEM once (constant BlockSpec index)
    and stay resident for the entire utterance batch.
  * FEATURE-MAJOR layout: every activation is (channels, batch), so the
    lane dimension is the batch (>= 128) — manual DMA slices of the ring
    buffer are lane-aligned, and every matmul is (M, K) @ (K, B) with
    K = features and N = batch, filling the MXU's 128x128 array (the
    batch-major layout leaves half the contraction empty at C = 64).
  * The packed ring buffer (sum_d, C, B) stays in HBM (`memory_space=ANY`,
    input/output aliased). Each step issues the dilated-tap reads as
    parallel manual DMAs up front (latency hides behind the early layers'
    compute) and writes each layer's new activation back, double-buffered
    through a VMEM history buffer and ordered by per-layer DMA semaphores.
  * Layers with dilation 1 never touch HBM: their tap IS last step's
    activation, still in the VMEM history buffer.
  * Current+dilated taps CONCATENATED: one (2G, 2C) @ (2C, B) matmul per
    layer instead of two half-contraction ones.
  * Post-network, Gumbel-max sampling (DEFAULT: per-lane counter hash —
    platform-independent, goldenable, replayable; opt-out: TPU PRNG),
    embedding lookup and the next step's input conv run in the final
    unrolled stage; classes stream out through a (1, 1, B) block per step.

Constraints: batch must be a multiple of 128 on real TPUs (lane alignment of
the manual DMA); the driver enforces/pads. Sampling RNG matches the turbo
engine (both default to the per-lane hash; both opt out to the TPU PRNG).

Precision note (measured on v5e, see BASELINE.md): at t=0 the mega logits are
BIT-EXACT vs the XLA engine; over long autoregressive runs the streams drift
apart (~1e-2 logit diff after 500 teacher-forced steps; first greedy argmax
flip t=168 on an untrained net — scripts/audit_check.py). ROOT CAUSE
(corrected round 2): the drift is the ACCUMULATION ORDER of this kernel's
merged contractions — the K=2C tap concat fuses xc+xp into one MXU
accumulation where the XLA engine rounds two separate matmuls before adding,
and the res+skip output merge likewise — NOT XLA matmul precision: running
the XLA engine under jax.default_matmul_precision("highest") leaves the
divergence at exactly t=168. Fewer roundings per output, so the mega path is
the (slightly) more accurate association; both are valid samples of the same
model. The bit-matching tier is `pallas` ↔ `xla`: verified ON-CHIP bit-exact
over 1000 free-running SAMPLED steps at default precision (B=128); CPU
interpret parity is exact for all engines (tests/test_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ArchConfig


def _gumbel_bits(q, bsz, seed_scalar, use_hw_prng):
    """uint32 bits, FEATURE-MAJOR shape (Q, B)."""
    if use_hw_prng:
        pltpu.prng_seed(seed_scalar)
        return pltpu.bitcast(pltpu.prng_random_bits((q, bsz)), jnp.uint32)
    ctr = (
        jax.lax.broadcasted_iota(jnp.uint32, (q, bsz), 0) * bsz
        + jax.lax.broadcasted_iota(jnp.uint32, (q, bsz), 1)
    )
    x = seed_scalar.astype(jnp.uint32) + ctr * jnp.uint32(0x9E3779B9)
    return _mix32(x)


def _mix32(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _perlane_bits(q, lane_ref, t_abs):
    """uint32 bits, feature-major (Q, B), from the per-lane counter hash.

    THE SAME function as generate.perlane_gumbel's bit stage (constants and
    op order must stay in lockstep — the serving reproducibility contract
    is that a lane's stream depends only on (lane_seed, t_local, class),
    independent of batch width, lane position, engine internals, and the
    platform PRNG). lane_ref is a (2, B) int32 VMEM block: row 0 the
    per-lane seeds, row 1 the lane lease times (absolute sample index)."""
    s = lane_ref[pl.ds(0, 1)].astype(jnp.uint32)             # (1, B)
    tl = (t_abs - lane_ref[pl.ds(1, 1)]).astype(jnp.uint32)  # (1, B)
    qi = jax.lax.broadcasted_iota(jnp.uint32, (q, s.shape[-1]), 0)
    return _mix32(
        s + tl * jnp.uint32(0x9E3779B9) + qi * jnp.uint32(0x7FEB352D)
    )


def _make_mega_kernel(arch: ArchConfig, temperature: float, has_cond: bool,
                      use_hw_prng: bool, buf_dtype, emit_logits: bool = False,
                      vmem_dmax: int = 1, streaming: bool = False,
                      per_lane: bool = False, lane_temp: bool = False):
    """vmem_dmax: layers with 1 < d <= vmem_dmax keep their ring in a VMEM
    scratch instead of HBM — their DMA machinery (issue + 2 semaphore waits
    per step) becomes two cheap VPU copies. d == 1 layers never have a ring
    at all (the tap is last step's activation)."""
    L = len(arch.dilations)
    dils = arch.dilations
    offsets = []
    acc = 0
    for d in dils:
        offsets.append(acc)
        acc += d
    # Row offsets (in units of C) inside the VMEM ring scratch.
    voffsets = [None] * L
    vacc = 0
    for l, d in enumerate(dils):
        if 1 < d <= vmem_dmax:
            voffsets[l] = vacc
            vacc += d
    has_vring = vacc > 0

    dt = jnp.dtype(arch.compute_dtype)

    if streaming and has_vring:
        raise NotImplementedError(
            "streaming carries do not include the experimental VMEM rings; "
            "use the default WAVENET_MEGA_VMEM_D=1 for mega streaming"
        )

    k_taps = arch.input_kernel

    def kernel(*refs):
        # Scalar prefetch: [seed_base, t0] (t0 = absolute sample index of
        # this chunk's first step; 0 for one-shot calls).
        (sc_ref,) = refs[:1]
        # res+skip output weights arrive pre-concatenated along M (C+S, G):
        # ONE matmul per layer instead of two. Bit-exact vs the split form
        # (each output row's contraction and the bias-add association are
        # unchanged) and measured faster at B=1536 (median 311 vs 316 ms
        # per 8192 steps — every rep of a 6-rep alternating A/B was faster;
        # neutral at B=512): the layer chain is latency-bound, so removing
        # 30 per-op issues shows up once compute saturates.
        (h0_ref, bufs_in, wcat_ref, b_ref, wrs_ref, brs_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, emb_ref, wicur_ref,
         bi_ref, forced_ref) = refs[1:15]
        idx = 15
        if k_taps > 1:
            e0_ref, wipast_ref = refs[idx:idx + 2]
            idx += 2
        else:
            e0_ref = wipast_ref = None
        if streaming:
            hst0_ref = refs[idx]
            idx += 1
        else:
            hst0_ref = None
        if has_cond:
            cond_ref, wcond_ref = refs[idx:idx + 2]
            idx += 2
        else:
            cond_ref = wcond_ref = None
        if per_lane:
            lane_ref = refs[idx]
            idx += 1
        else:
            lane_ref = None
        n_stream_out = (3 if k_taps > 1 else 2) if streaming else 0
        n_out = 2 + (1 if emit_logits else 0) + n_stream_out
        outs = refs[idx:idx + n_out]
        idx += n_out
        bufs_ref, cls_ref = outs[0], outs[1]
        logits_ref = outs[2] if emit_logits else None
        es_out = None
        if streaming:
            if k_taps > 1:
                hstate_out, hs_out, es_out = outs[-3:]
            else:
                hstate_out, hs_out = outs[-2:]
        scr = list(refs[idx:])
        h_s = scr.pop(0)
        e_s = scr.pop(0) if k_taps > 1 else None
        hstate = scr.pop(0)
        vring = scr.pop(0) if has_vring else None
        rsem, wsem = scr
        # hstate (L*2C, B): per layer a contiguous [current h | dilated tap]
        # pair — rows [l*2C, l*2C+C) stage this step's h (DMA'd back to the
        # ring), rows [l*2C+C, (l+1)*2C) receive the tap DMA. The gated
        # matmul reads the (2C, B) pair directly: no concat materialization.

        t = pl.program_id(0)
        t_abs = sc_ref[1] + t  # == t for one-shot (t0 = 0)
        seed_ref = sc_ref      # seed at index 0 (see _gumbel seed use)

        @pl.when(t == 0)
        def _():
            h_s[:] = h0_ref[:]
            if e_s is not None:
                e_s[:] = e0_ref[:]
            if streaming:
                # Resume mid-stream: the staged [h | tap] pairs from the
                # previous chunk's last step (d == 1 taps live here).
                hstate[:] = hst0_ref[:]
            else:
                hstate[:] = jnp.zeros_like(hstate)
            if vring is not None:
                vring[:] = jnp.zeros_like(vring)

        def mm(w, a):
            # (M, K) @ (K, B) -> (M, B), fp32 accumulation on the MXU.
            return jax.lax.dot_general(
                w.astype(dt), a.astype(dt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # Issue all dilated-tap reads up front (d > 1 only): latency hides
        # behind the early layers' compute. Safe vs last step's writes: a
        # row written at step t-1 is re-read no earlier than step t-1+d.
        c_dim = h_s.shape[0]
        slots = [None] * L
        for l in range(L):
            if dils[l] > 1 and voffsets[l] is None:
                slot = (
                    offsets[l] + jax.lax.rem(t_abs, jnp.int32(dils[l]))
                ) * c_dim
                slots[l] = slot
                pltpu.make_async_copy(
                    bufs_ref.at[pl.ds(slot, c_dim)],
                    hstate.at[pl.ds(l * 2 * c_dim + c_dim, c_dim)],
                    rsem.at[l],
                ).start()

        bsz = h_s.shape[-1]
        skip = None
        h = h_s[:]
        for l in range(L):
            row0 = l * 2 * c_dim
            if dils[l] > 1 and voffsets[l] is not None:
                # VMEM-resident ring: read the tap, then overwrite the slot
                # with this step's h — two VPU copies, no DMA/semaphores.
                vslot = (
                    voffsets[l] + jax.lax.rem(t_abs, jnp.int32(dils[l]))
                ) * c_dim
                hstate[pl.ds(row0 + c_dim, c_dim)] = vring[pl.ds(vslot, c_dim)]
                vring[pl.ds(vslot, c_dim)] = h.astype(buf_dtype)
                hstate[pl.ds(row0, c_dim)] = h.astype(buf_dtype)
            elif dils[l] > 1:
                # Order: tap read done -> prior write-back done -> stage h ->
                # start write-back -> compute on the contiguous pair.
                pltpu.make_async_copy(
                    bufs_ref.at[pl.ds(slots[l], c_dim)],
                    hstate.at[pl.ds(row0 + c_dim, c_dim)],
                    rsem.at[l],
                ).wait()

                @pl.when(t > 0)
                def _():
                    pltpu.make_async_copy(
                        hstate.at[pl.ds(row0, c_dim)],
                        bufs_ref.at[pl.ds(slots[l], c_dim)],
                        wsem.at[l],
                    ).wait()

                hstate[pl.ds(row0, c_dim)] = h.astype(buf_dtype)
                pltpu.make_async_copy(
                    hstate.at[pl.ds(row0, c_dim)],
                    bufs_ref.at[pl.ds(slots[l], c_dim)],
                    wsem.at[l],
                ).start()
            else:
                # d == 1: the tap is last step's activation — move it within
                # the pair (one (C, B) VMEM copy; zeros at t == 0 from init).
                hstate[pl.ds(row0 + c_dim, c_dim)] = hstate[pl.ds(row0, c_dim)]
                hstate[pl.ds(row0, c_dim)] = h.astype(buf_dtype)

            pre = mm(wcat_ref[l], hstate[pl.ds(row0, 2 * c_dim)]) + b_ref[l]
            if has_cond:
                pre = pre + mm(wcond_ref[l], cond_ref[0])
            g = pre.shape[0] // 2
            z = jnp.tanh(pre[:g]) * jax.nn.sigmoid(pre[g:])
            # Biases stay OUTSIDE the merged matmul and keep the split
            # form's addition order ((h + mm) + b_res; mm + b_skip) so the
            # merge is bit-exact vs models/wavenet.py's gated_layer.
            rs = mm(wrs_ref[l], z)                    # (C+S, B)
            h = h + rs[:c_dim] + brs_ref[l][:c_dim]
            contrib = rs[c_dim:] + brs_ref[l][c_dim:]
            skip = contrib if skip is None else skip + contrib

        # Final grid step: drain outstanding write DMAs — a pallas_call must
        # not end with in-flight DMA (undefined behavior / runtime crash).
        @pl.when(t == pl.num_programs(0) - 1)
        def _drain():
            for l in range(L):
                if dils[l] > 1 and voffsets[l] is None:
                    pltpu.make_async_copy(
                        hstate.at[pl.ds(l * 2 * c_dim, c_dim)],
                        bufs_ref.at[pl.ds(slots[l], c_dim)],
                        wsem.at[l],
                    ).wait()

        # ---- post-network + sampling + next-step frontend ----
        hidden = jax.nn.relu(mm(w1_ref[:], jax.nn.relu(skip)) + b1_ref[:])
        logits = mm(w2_ref[:], hidden) + b2_ref[:]       # (Q, B)
        q = logits.shape[0]
        if emit_logits:
            logits_ref[0] = logits
        if temperature > 0.0:
            if per_lane:
                bits = _perlane_bits(q, lane_ref, t_abs)
            else:
                bits = _gumbel_bits(q, bsz, seed_ref[0] + t_abs, use_hw_prng)
            top24 = pltpu.bitcast(
                jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
            )
            u = (top24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
            gum = -jnp.log(-jnp.log(u))
            if lane_temp:
                # Per-lane inverse temperature (serving): lane row 2 holds
                # host-computed f32(1/tau) bits; inv == 0 is a greedy lane
                # (raw-logits argmax, bit-matching a dedicated greedy run).
                inv = pltpu.bitcast(lane_ref[pl.ds(2, 1)], jnp.float32)
                scores = jnp.where(inv > 0.0, logits * inv + gum, logits)
            else:
                scores = logits * (1.0 / temperature) + gum
        else:
            scores = logits
        m = jnp.max(scores, axis=0, keepdims=True)        # (1, B)
        row = jax.lax.broadcasted_iota(jnp.int32, (q, bsz), 0)
        cls = jnp.min(
            jnp.where(scores >= m, row, jnp.int32(q)), axis=0
        ).astype(jnp.int32)                               # (B,)
        forced = forced_ref[0, 0]
        cls = jnp.where(forced >= 0, forced, cls)
        cls_ref[0, 0] = cls

        onehot = (row == cls[None, :]).astype(jnp.float32)  # (Q, B)
        e_next = mm(emb_ref[:], onehot)                     # (C, B)
        # Width-K input conv for the next step: current tap on e_next plus
        # the K-1 carried embeddings (feature-major stack, oldest-first C-
        # row blocks), then shift the stack. K=2 keeps the original
        # two-matmul addition order (bit-exact).
        h_new = bi_ref[:] + mm(wicur_ref[:], e_next)
        if k_taps > 1:
            for j in range(k_taps - 1):
                h_new = h_new + mm(
                    wipast_ref[j], e_s[pl.ds(j * c_dim, c_dim)]
                )
            for j in range(k_taps - 2):
                e_s[pl.ds(j * c_dim, c_dim)] = e_s[pl.ds((j + 1) * c_dim,
                                                         c_dim)]
            e_s[pl.ds((k_taps - 2) * c_dim, c_dim)] = e_next
        h_s[:] = h_new

        if streaming:
            # Export the VMEM carries so the next chunk resumes exactly:
            # h_s/e_s are already the NEXT step's frontend; hstate rows hold
            # each layer's last-step h (the d == 1 taps).
            @pl.when(t == pl.num_programs(0) - 1)
            def _export():
                hstate_out[:] = hstate[:]
                hs_out[:] = h_s[:]
                if es_out is not None:
                    es_out[:] = e_s[:]

    return kernel


def estack_feature_major(estack: jnp.ndarray) -> jnp.ndarray:
    """(K-1, B, C) embedding stack -> ((K-1)*C, B) feature-major layout:
    C-row block j holds estack[j]^T (oldest tap first) — the mega kernel's
    carried input-conv state."""
    k1, b, c = estack.shape
    return jnp.swapaxes(estack, 1, 2).reshape(k1 * c, b).astype(jnp.float32)


def mega_zero_carry(arch: ArchConfig, h0, estack0):
    """Initial streaming carry (feature-major), equivalent to one-shot
    start: empty rings, zero staged pairs, frontend from the zero class.
    estack0 is generate._fused_frontend_zero's (K-1, B, C) stack."""
    b, c = h0.shape
    L = len(arch.dilations)
    return {
        "bufs": jnp.zeros((sum(arch.dilations) * c, b), jnp.float32),
        "hstate": jnp.zeros((L * 2 * c, b), jnp.float32),
        "h_s": jnp.swapaxes(h0, 0, 1).astype(jnp.float32),
        "e_s": estack_feature_major(estack0),
    }


@functools.partial(
    jax.jit,
    static_argnames=("arch", "n_samples", "temperature", "has_cond",
                     "interpret", "emit_logits", "vmem_dmax", "streaming"),
)
def mega_generate(
    params: dict,
    lp: dict,                      # layer params (w_cond possibly folded)
    arch: ArchConfig,
    h0: jnp.ndarray,               # (B, C) first-step residual input
    e0: jnp.ndarray,               # (K-1, B, C) carried embedding stack
    seed_base: jnp.ndarray,        # () int32
    forced_ts: jnp.ndarray,        # (T, 1, B) int32
    cond_ts: Optional[jnp.ndarray],  # (T, B, Cc) or None
    n_samples: int,
    temperature: float,
    has_cond: bool,
    interpret: bool = False,
    emit_logits: bool = False,
    vmem_dmax: int = 1,
    streaming: bool = False,
    carry: Optional[dict] = None,  # mega_zero_carry-shaped (streaming only)
    t0: Optional[jnp.ndarray] = None,  # () int32 absolute chunk start
    lane: Optional[jnp.ndarray] = None,  # (2, B) int32 [seeds; lease times]
):
    """Run the whole generation loop; returns classes (T, 1, B) int32
    (plus logits (T, Q, B) when emit_logits — the correctness-test hook).
    With streaming=True, also returns the carry for the next chunk: ring
    slots and the sampling-seed chain use the ABSOLUTE time t0 + t, so
    chunked output continues the one-shot sequence exactly.

    All operands are transposed to feature-major here (a few trace-time
    transposes on tiny arrays); callers keep the batch-major convention.
    """
    L = len(arch.dilations)
    b, c = h0.shape
    two_g = lp["w_cur"].shape[-1]
    gch = two_g // 2
    s = arch.skip_channels
    q = arch.quant_channels
    dt = jnp.dtype(arch.compute_dtype)
    # NOTE: bf16 ring buffers / VMEM weights were tried (mathematically
    # equivalent for bf16 archs since the matmul casts anyway) and MEASURED
    # SLOWER on v5e (269 vs 320 audio-sec/s @ B=256; 126 vs 412 @ B=512):
    # the (16,128) bf16 tiling forces VPU pack/relayout on every f32<->bf16
    # staging store. fp32 residency wins; keep buf_dtype fp32.
    buf_dtype = jnp.float32
    pp = params["post"]
    w_in = params["input_conv"]["w"]

    def wcast(x):
        return x

    if not interpret and b % 128 != 0:
        raise ValueError(
            f"mega engine needs batch % 128 == 0 on TPU (lane alignment of "
            f"the ring-buffer DMA); got {b}. Pad the batch or use the turbo "
            f"engine."
        )

    def tr(x):
        return jnp.swapaxes(x, -1, -2)

    # (L, 2G, 2C): current tap columns first, dilated tap columns second.
    wcat = tr(jnp.concatenate([lp["w_cur"], lp["w_prev"]], axis=1))
    if streaming:
        bufs = carry["bufs"]
        h_in, e_in = carry["h_s"], carry["e_s"]
    else:
        bufs = jnp.zeros((sum(arch.dilations) * c, b), buf_dtype)
        h_in, e_in = tr(h0), estack_feature_major(e0)
        t0 = jnp.int32(0)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda t, seed: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    # Merged res+skip output weights/biases (see the kernel comment).
    rs_specs = [
        whole((L, c + s, gch)),            # [w_res^T ; w_skip^T]
        whole((L, c + s, 1)),              # [b_res ; b_skip]
    ]
    rs_args = [
        wcast(jnp.concatenate(
            [tr(lp["w_res"]), tr(lp["w_skip"])], axis=1
        )),
        jnp.concatenate([lp["b_res"], lp["b_skip"]], axis=1)[:, :, None],
    ]
    k_taps = arch.input_kernel
    in_specs = [
        whole((c, b)),                     # h0^T
        pl.BlockSpec(memory_space=pl.ANY),  # bufs (manual DMA)
        whole((L, two_g, 2 * c)),          # wcat^T
        whole((L, two_g, 1)),              # b
        *rs_specs,
        whole((s, s)), whole((s, 1)),      # post w1^T/b1
        whole((q, s)), whole((q, 1)),      # post w2^T/b2
        whole((c, q)),                     # embed^T
        whole((c, c)), whole((c, 1)),      # input conv: w[K-1]^T, bias
        pl.BlockSpec((1, 1, b), lambda t, seed: (t, 0, 0),
                     memory_space=pltpu.VMEM),        # forced
    ]
    args = [
        h_in, bufs,
        wcast(wcat), lp["b"][:, :, None],
        *rs_args,
        wcast(tr(pp["w1"])), pp["b1"][:, None],
        wcast(tr(pp["w2"])), pp["b2"][:, None],
        wcast(tr(params["embed"])),
        wcast(tr(w_in[k_taps - 1])),
        params["input_conv"]["b"][:, None],
        forced_ts,
    ]
    # Operand indices for input/output aliasing (operand 0 is the scalar-
    # prefetch vector, so arg position i is operand i + 1).
    h0_op, bufs_op = 1, 2
    e0_op = hstate_op = None
    if k_taps > 1:
        # Carried embedding stack ((K-1)*C, B) + past taps (K-1, C, C).
        e0_op = len(args) + 1
        in_specs += [whole(((k_taps - 1) * c, b)), whole((k_taps - 1, c, c))]
        args += [e_in, wcast(jnp.swapaxes(w_in[: k_taps - 1], 1, 2))]
    if streaming:
        hstate_op = len(args) + 1
        in_specs.append(whole((L * 2 * c, b)))   # hstate carry-in
        args.append(carry["hstate"])
    if has_cond:
        cc = lp["w_cond"].shape[1]
        in_specs += [
            pl.BlockSpec((1, cc, b), lambda t, seed: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            whole((L, two_g, cc)),
        ]
        args += [tr(cond_ts), wcast(tr(lp["w_cond"]))]
    if lane is not None:
        # per-lane [seeds; lease times; optional f32(1/tau) bits]
        in_specs.append(whole((lane.shape[0], b)))
        args.append(lane)

    # Layers with 1 < d <= vmem_dmax keep their rings in VMEM scratch (no
    # DMA). Measured NEUTRAL on v5e at wavenet30/B=512 (7-run cross-process
    # A/B, means 367 vs 368 a-s/s — the ring DMAs are already fully hidden
    # behind the layer compute), so the proven HBM-DMA default is 1;
    # WAVENET_MEGA_VMEM_D enables it (read in generate_classes, OUTSIDE
    # jit, and threaded here as a static arg so flips always retrace).
    vrows = sum(d for d in arch.dilations if 1 < d <= vmem_dmax)

    kernel = _make_mega_kernel(
        arch, temperature, has_cond, use_hw_prng=not interpret,
        buf_dtype=buf_dtype, emit_logits=emit_logits, vmem_dmax=vmem_dmax,
        streaming=streaming, per_lane=lane is not None,
        lane_temp=lane is not None and lane.shape[0] == 3,
    )
    vring_scratch = (
        [pltpu.VMEM((vrows * c, b), buf_dtype)] if vrows > 0 else []
    )

    # Outputs: bufs, classes[, logits][, hstate, h_s[, e_s]] — carries are
    # input/output aliased for zero-copy chunk transitions.
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # bufs (aliased)
        pl.BlockSpec((1, 1, b), lambda t, seed: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(bufs.shape, buf_dtype),
        jax.ShapeDtypeStruct((n_samples, 1, b), jnp.int32),
    ]
    if emit_logits:
        out_specs.append(pl.BlockSpec((1, q, b), lambda t, seed: (t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_samples, q, b), jnp.float32)
        )
    aliases = {bufs_op: 0}
    if streaming:
        hstate_out_idx = len(out_specs)
        out_specs += [whole((L * 2 * c, b)), whole((c, b))]
        out_shape += [
            jax.ShapeDtypeStruct((L * 2 * c, b), buf_dtype),
            jax.ShapeDtypeStruct((c, b), jnp.float32),
        ]
        aliases[hstate_op] = hstate_out_idx
        aliases[h0_op] = hstate_out_idx + 1
        if k_taps > 1:
            out_specs.append(whole(((k_taps - 1) * c, b)))
            out_shape.append(
                jax.ShapeDtypeStruct(((k_taps - 1) * c, b), jnp.float32)
            )
            aliases[e0_op] = hstate_out_idx + 2

    scratch = [pltpu.VMEM((c, b), jnp.float32)]          # h_s
    if k_taps > 1:
        scratch.append(
            pltpu.VMEM(((k_taps - 1) * c, b), jnp.float32)  # e_s stack
        )
    scratch.append(pltpu.VMEM((L * 2 * c, b), buf_dtype))  # hstate pairs

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_samples,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch + vring_scratch + [
                pltpu.SemaphoreType.DMA((L,)),          # read sems
                pltpu.SemaphoreType.DMA((L,)),          # write sems
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # The default scoped-VMEM cap (16 MB) is below what v5e offers;
            # large-batch / conditioned / emit_logits variants need headroom
            # for weights + the (L*2C, B) pair scratch + pipeline buffers.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.stack([seed_base.astype(jnp.int32), t0.astype(jnp.int32)]), *args)
    if streaming:
        if emit_logits:
            bufs_out, classes, logits = out[:3]
            rest = out[3:]
        else:
            bufs_out, classes = out[:2]
            rest = out[2:]
            logits = None
        if k_taps > 1:
            hstate_o, hs_o, es_o = rest
        else:
            hstate_o, hs_o = rest
            es_o = jnp.zeros((0, b), jnp.float32)
        new_carry = {
            "bufs": bufs_out, "hstate": hstate_o, "h_s": hs_o, "e_s": es_o,
        }
        if emit_logits:
            return classes, logits, new_carry
        return classes, new_carry
    if emit_logits:
        _, classes, logits = out
        return classes, logits
    _, classes = out
    return classes
