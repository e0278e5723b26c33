"""Autoregressive synthesis engines.

Reference parity: the reference's `generate.py` implements the Fast-WaveNet
algorithm (arXiv 1611.09482) — per layer a FIFO queue of length = dilation
holding past activations, one Session.run per audio sample, O(layers) work per
sample (SURVEY.md §3.2). Its throughput wall is the per-sample Python↔runtime
round trip.

TPU-first redesign (BASELINE.json north-star): the cached-activation queues
become per-layer RING BUFFERS resident in HBM, carried through ONE jitted
`lax.scan` over all T samples — zero host round-trips for an entire utterance
batch. A ring buffer of length d_l per layer holds the residual-stream
activation h_l(t - d_l) .. h_l(t - 1); at step t the slot `t mod d_l` is read
(it contains h_l(t - d_l), exactly the dilated tap) and then overwritten with
h_l(t) — a circular index update with NO data movement, unlike a shift-queue.
Everything is batched over B utterances so the per-step matmuls keep the MXU
fed.

Engines (slowest/strongest-guarantees to fastest):
  * `naive_sample` — oracle: re-runs the full training forward on the
    trailing receptive field for every sample (tests only).
  * engine="xla" — ring-buffer scan with a plain XLA body.
  * engine="pallas" — fused all-layer Pallas stack kernel per step
    (ops/pallas/ar_step.py); bit-matches "xla" including the RNG stream.
  * engine="turbo" — the whole step in one kernel incl. Gumbel-max sampling
    on the TPU PRNG (ops/pallas/ar_turbo.py).
  * engine="mega" — the whole GENERATION LOOP in one pallas_call
    (ops/pallas/ar_mega.py); fastest; batch must be a multiple of 128.

All consume the SAME parameter pytree as training `forward` — the
Fast-WaveNet train≡incremental invariant is tested in tests/test_generate.py
and tests/test_pallas.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import ArchConfig
from .models.wavenet import Params, post_network
from .ops.mulaw import mu_law_decode


class RingState(NamedTuple):
    """Scan carry for the incremental engine.

    All layers' ring buffers live in ONE packed HBM array (sum(dilations),
    B, C); layer l owns rows [offset_l, offset_l + d_l) and its dilated tap
    at time t is row offset_l + (t mod d_l). Packing keeps the carry a single
    large array (one in-place dynamic-update region for XLA) and is exactly
    the layout the fused Pallas kernel indexes with scalar-prefetched slots.
    """

    embed_buf: jnp.ndarray        # (K-1, B, C): past input-conv embeddings
    bufs: jnp.ndarray             # (sum_d, B, C) packed residual-stream history
    prev_class: jnp.ndarray       # (B,) int32: sample emitted at t-1
    rng: jax.Array                # PRNG key chain


def buffer_offsets(arch: ArchConfig) -> tuple:
    """Static row offset of each layer's ring inside the packed buffer."""
    offs, acc = [], 0
    for d in arch.dilations:
        offs.append(acc)
        acc += d
    return tuple(offs)


def init_ring_state(
    arch: ArchConfig, batch: int, rng: jax.Array, dtype=jnp.float32
) -> RingState:
    c = arch.residual_channels
    k = arch.input_kernel
    return RingState(
        embed_buf=jnp.zeros((k - 1, batch, c), dtype),
        bufs=jnp.zeros((sum(arch.dilations), batch, c), dtype),
        # The reference initializes queues with zeros / silence; class of
        # waveform 0 is the mu-law zero class Q//2 (mid-rise upper straddle).
        prev_class=jnp.full((batch,), arch.quant_channels // 2, jnp.int32),
        rng=rng,
    )


def _mm(x, w, dtype):
    return jax.lax.dot_general(
        x.astype(dtype),
        w.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def post_network_sharded(params: Params, skip_local, dtype, model_axis: str):
    """Post network over a skip accumulator SHARDED on its channel dim.

    skip_local is this shard's (B, S/n) slice, post.w1 this shard's
    (S/n, S) row block; the hidden pre-activation is completed with ONE
    psum over `model_axis` (b1 is replicated and added once, after the
    reduction). w2/b2 replicated. This is the entire collective cost of
    model-sharded synthesis on the fused-kernel path — per STEP, not per
    layer (docs/kernels.md "Model-sharded synthesis")."""
    p = params["post"]
    a = jax.nn.relu(skip_local)
    part = _mm(a, p["w1"], dtype)                     # (B, S) partial
    hidden = jax.nn.relu(jax.lax.psum(part, model_axis) + p["b1"])
    return _mm(hidden, p["w2"], dtype) + p["b2"]


def stack_step(
    params: Params,
    arch: ArchConfig,
    state: RingState,
    t: jnp.ndarray,
    x_class: jnp.ndarray,
    cond_t: Optional[jnp.ndarray] = None,
    gcond: Optional[jnp.ndarray] = None,
    model_axis: Optional[str] = None,
):
    """One incremental forward step: class (B,) at time t -> logits (B, Q).

    Mirrors models/wavenet.py::forward exactly, one timestep at a time, with
    ring-buffer reads standing in for the d-shifted activations. Returns
    (new_state_bufs..., logits).
    """
    dtype = jnp.dtype(arch.compute_dtype)
    lp = params["layers"]
    k_taps = arch.input_kernel

    e = params["embed"][x_class]  # (B, C)
    # Input causal conv over [embed_buf (oldest..newest), e].
    w_in = params["input_conv"]["w"]
    h = params["input_conv"]["b"].astype(jnp.float32) + _mm(e, w_in[k_taps - 1], dtype)
    for j in range(k_taps - 1):
        # embed_buf[j] holds e(t - (K-1-j)).
        h = h + _mm(state.embed_buf[j], w_in[j], dtype)
    new_embed_buf = (
        jnp.concatenate([state.embed_buf[1:], e[None].astype(state.embed_buf.dtype)], axis=0)
        if k_taps > 1
        else state.embed_buf
    )

    g = lp["w_cur"].shape[-1] // 2
    # Width from the (possibly model-axis-sliced) w_skip, not the arch.
    skip_sum = jnp.zeros((h.shape[0], lp["w_skip"].shape[-1]), jnp.float32)
    offsets = buffer_offsets(arch)
    bufs = state.bufs
    for i, d in enumerate(arch.dilations):
        slot = offsets[i] + jax.lax.rem(t, jnp.int32(d))
        h_prev = jax.lax.dynamic_index_in_dim(bufs, slot, axis=0, keepdims=False)
        # For t < d the slot still holds the zero init — correct: the
        # dilated tap reaches before the sequence start, where h == 0
        # matches forward()'s shift_right zero padding.
        bufs = jax.lax.dynamic_update_index_in_dim(
            bufs, h.astype(bufs.dtype), slot, axis=0
        )
        pre = _mm(h, lp["w_cur"][i], dtype) + _mm(h_prev, lp["w_prev"][i], dtype) + lp["b"][i]
        if cond_t is not None:
            pre = pre + _mm(cond_t, lp["w_cond"][i], dtype)
        if gcond is not None:
            pre = pre + _mm(gcond, lp["w_gcond"][i], dtype)
        z = jnp.tanh(pre[..., :g]) * jax.nn.sigmoid(pre[..., g:])
        h = h + _mm(z, lp["w_res"][i], dtype) + lp["b_res"][i]
        skip_sum = skip_sum + _mm(z, lp["w_skip"][i], dtype) + lp["b_skip"][i]

    if model_axis is not None:
        logits = post_network_sharded(params, skip_sum, dtype, model_axis)
    else:
        logits = post_network(params, skip_sum, dtype)
    return new_embed_buf, bufs, logits


def _sample_class(rng, logits, temperature: float):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(rng, logits / temperature, axis=-1).astype(
        jnp.int32
    )


# ---------------------------------------------------------------------------
# Per-lane counter-based sampling (serving reproducibility tier).
#
# The default sampling chain is SESSION-GLOBAL (one key/seed per step for the
# whole batch): fast, but a recycled serving lane draws different randomness
# than a dedicated session would, so *sampled* requests are not reproducible
# (greedy ones are — reset_lanes docstring). Per-lane mode replaces the noise
# source with a stateless counter hash over (lane_seed[b], t_local, class):
# a lane's sampled stream depends on nothing else — not the batch width, not
# the lane position, not the platform PRNG — so a pooled request bit-matches
# a dedicated session started with the same per-lane seed (and CPU == TPU).
# The hash below and the mega kernel's _perlane_bits are THE SAME function;
# tests pin the bit-equality.

_PL_T = 0x9E3779B9   # mixing constants (uint32, golden-ratio / murmur3)
_PL_Q = 0x7FEB352D


def _perlane_mix(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def perlane_gumbel(lane_seed, t_local, q: int):
    """(B, Q) Gumbel noise from the per-lane counter hash (batch-major)."""
    s = lane_seed.astype(jnp.uint32)[:, None]
    tl = t_local.astype(jnp.uint32)[:, None]
    qi = jax.lax.broadcasted_iota(
        jnp.uint32, (lane_seed.shape[0], q), 1
    )
    x = _perlane_mix(
        s + tl * jnp.uint32(_PL_T) + qi * jnp.uint32(_PL_Q)
    )
    u = (
        jax.lax.shift_right_logical(x, jnp.uint32(8)).astype(jnp.float32)
        + 0.5
    ) * (1.0 / (1 << 24))
    return -jnp.log(-jnp.log(u))


def _sample_class_perlane(logits, temperature: float, lane_seed, t_local,
                          lane_inv_temp=None):
    """Per-lane-hash sampling; `lane_inv_temp` (B,) f32 switches to
    PER-LANE temperature: each lane scores logits * inv + gumbel with its
    own inverse temperature, and inv == 0 means greedy (argmax of raw
    logits — the gumbel term is dropped, matching a dedicated greedy
    session bit-exactly). Serving contract: inv must be the HOST-computed
    float32(1.0 / tau) so a pooled request at tau bit-matches a dedicated
    session whose kernel folds the same double-precision 1/tau constant."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    gum = perlane_gumbel(lane_seed, t_local, logits.shape[-1])
    if lane_inv_temp is not None:
        inv = lane_inv_temp.astype(jnp.float32)[:, None]
        scores = jnp.where(inv > 0.0, logits * inv + gum, logits)
    else:
        scores = logits * (1.0 / temperature) + gum
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def derive_lane_seeds(seed_base: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Default per-lane seeds for the fused engines' sampled path.

    The fused engines (turbo/mega) sample by DEFAULT from the stateless
    per-lane counter hash (VERDICT r2 item 3: measured cost-neutral
    on-chip, and it makes the sampled stream platform-independent —
    CPU interpret == TPU — hence goldenable and replayable). When the
    caller does not pin lane seeds explicitly (serving does), each lane's
    seed is derived from the session seed_base and its lane index by one
    extra hash round, so lanes are decorrelated and a (rng, lane) pair
    fully determines the stream. The odd multiplier differs from the
    in-hash time/class constants so lane/time/class offsets can't alias.
    Mirrored in NumPy by tests/fast_wavenet_oracle.py.
    """
    b = jax.lax.broadcasted_iota(jnp.uint32, (batch,), 0)
    mixed = _perlane_mix(
        seed_base.astype(jnp.uint32) + b * jnp.uint32(0xB5297A4D)
    )
    return (mixed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)


def _pack_lane(lane_seed, lane_t0, lane_inv_temp=None):
    """(2|3, B) int32 lane block for the fused kernels: [seeds; lease
    times; optional inverse-temperature BITS]. The third row carries the
    per-lane f32(1/tau) bitcast to int32 (the lane block is an int32 VMEM
    input); the kernels bitcast it back, and inv == 0 means a greedy
    lane."""
    if lane_seed is None:
        return None
    rows = [lane_seed.astype(jnp.int32), lane_t0.astype(jnp.int32)]
    if lane_inv_temp is not None:
        rows.append(jax.lax.bitcast_convert_type(
            lane_inv_temp.astype(jnp.float32), jnp.int32
        ))
    return jnp.stack(rows)


def generate_classes(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    cond: Optional[jnp.ndarray] = None,       # (B, T>=n_samples, cond_ch) upsampled
    speaker_ids: Optional[jnp.ndarray] = None,
    forced: Optional[jnp.ndarray] = None,     # (B, T) int32, -1 = free-running
    temperature: float = 1.0,
    return_logits: bool = False,
    use_pallas: bool = False,
    engine: Optional[str] = None,
    global_rng: bool = False,
    model_axis: Optional[str] = None,
):
    """Non-jitted entry: experiment env knobs are read HERE, outside every
    jit trace, and threaded through as static args — so an in-process flip
    of a knob retraces instead of silently hitting the cached executable.

    `model_axis` (xla/pallas engines, inside shard_map only): the skip/post
    params are channel-sliced over that mesh axis and the post hidden is
    completed with one per-step psum — model-sharded synthesis at
    fused-kernel speed (parallel/synthesis.py)."""
    import os as _os

    return _generate_classes_jit(
        params, arch, rng, batch, n_samples, cond, speaker_ids, forced,
        temperature, return_logits, use_pallas, engine,
        mega_vmem_d=int(_os.environ.get("WAVENET_MEGA_VMEM_D", "1")),
        mega_pad_test=int(_os.environ.get("WAVENET_MEGA_PAD_TEST", "1")),
        global_rng=global_rng, model_axis=model_axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch",
        "batch",
        "n_samples",
        "temperature",
        "return_logits",
        "use_pallas",
        "engine",
        "mega_vmem_d",
        "mega_pad_test",
        "global_rng",
        "model_axis",
    ),
)
def _generate_classes_jit(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    cond: Optional[jnp.ndarray] = None,       # (B, T>=n_samples, cond_ch) upsampled
    speaker_ids: Optional[jnp.ndarray] = None,
    forced: Optional[jnp.ndarray] = None,     # (B, T) int32, -1 = free-running
    temperature: float = 1.0,
    return_logits: bool = False,
    use_pallas: bool = False,
    engine: Optional[str] = None,
    mega_vmem_d: int = 1,
    mega_pad_test: int = 1,
    global_rng: bool = False,
    model_axis: Optional[str] = None,
):
    """Ring-buffer scan over n_samples steps. Returns (classes (B, T)[, logits]).

    `forced` implements priming/teacher-forcing: wherever forced[b, t] >= 0
    the emitted class is overridden by it (the model still updates its state
    from the forced sample, exactly like the reference priming its queues).

    Engines (`engine`, or legacy `use_pallas`):
      * "xla"    — plain XLA scan body (reference path).
      * "pallas" — fused Pallas stack kernel + XLA post/sampling; bit-matches
                   "xla" including the RNG stream.
      * "turbo"  — everything in-kernel incl. Gumbel-max sampling.
      * "mega"   — the whole loop in one kernel (fastest).

    Fused-engine sampling: by DEFAULT turbo/mega draw noise from the
    stateless per-lane counter hash with seeds derived from the session
    rng (derive_lane_seeds) — platform-independent (CPU == TPU),
    oracle-goldenable, and replayable per lane; turbo and mega consume
    identical noise. global_rng=True opts back into the session-global
    platform PRNG chain (pltpu.prng_random_bits on TPU).
    """
    if engine is None:
        engine = "pallas" if use_pallas else "xla"
    b = int(batch)
    gcond = None
    if speaker_ids is not None:
        gcond = params["speaker_embed"][speaker_ids]  # (B, E)

    if model_axis is not None and engine in ("turbo", "mega"):
        # TP at mega-kernel speed (r4): the whole-loop/in-kernel-finale
        # formulations degenerate to the per-step skip-psum design when a
        # model axis is present (the psum is an XLA collective), sharing
        # ONE fused step kernel that keeps mega's merged contractions and
        # feature-major MXU fill (ops/pallas/ar_tp.py).
        if return_logits:
            raise ValueError(
                "return_logits is not supported on the model-axis fused TP "
                "path; use engine='pallas' (or 'xla') with model_axis for "
                "logits"
            )
        if global_rng and temperature > 0.0:
            raise ValueError(
                "global_rng sampling draws from the in-kernel platform "
                "PRNG, which the TP path's XLA-side sampler cannot "
                "reproduce; use the default per-lane hash (or greedy)"
            )
        return _generate_classes_tp(
            params, arch, rng, b, n_samples, cond, gcond, forced,
            temperature, model_axis,
        )
    if engine in ("turbo", "mega"):
        return _generate_classes_fused(
            params, arch, rng, b, n_samples, cond, gcond, forced, temperature,
            engine, return_logits, mega_vmem_d, mega_pad_test, global_rng,
        )

    state = init_ring_state(arch, b, rng)
    _, out = _run_scan_engine(
        params, arch, state, jnp.int32(0), n_samples, cond, forced, gcond,
        temperature, return_logits, engine, model_axis=model_axis,
    )
    if return_logits:
        classes, logits = out
        return jnp.swapaxes(classes, 0, 1), jnp.swapaxes(logits, 0, 1)
    return jnp.swapaxes(out, 0, 1)


def _resolve_step_fn(engine: str, model_axis: Optional[str] = None):
    if engine == "pallas":
        from .ops.pallas.ar_step import pallas_stack_step

        # Pallas-TPU kernels run in interpreter mode on CPU (tests).
        return functools.partial(
            pallas_stack_step, interpret=jax.default_backend() == "cpu",
            model_axis=model_axis,
        )
    if engine == "xla":
        return functools.partial(stack_step, model_axis=model_axis)
    raise ValueError(f"unknown engine {engine!r}")


def _run_scan_engine(
    params,
    arch: ArchConfig,
    state: RingState,
    t0: jnp.ndarray,
    n_samples: int,
    cond,
    forced,
    gcond,
    temperature: float,
    return_logits: bool,
    engine: str,
    lane_seed=None,
    lane_t0=None,
    model_axis: Optional[str] = None,
    lane_inv_temp=None,
):
    """Scan n_samples steps from `state` at absolute time offset t0.

    Shared by one-shot generation (t0 = 0, fresh state) and streaming
    chunks (carried state): the ring-slot phase (t mod d) and the RNG chain
    both continue exactly, so chunked output bit-matches one-shot output.

    lane_seed/lane_t0 (B,) int32 switch sampling to the per-lane counter
    hash (serving reproducibility — see perlane_gumbel); the carried rng
    chain is then untouched. lane_inv_temp (B,) f32 additionally gives each
    lane its own inverse temperature (0 = greedy lane).
    """
    step_fn = _resolve_step_fn(engine, model_axis=model_axis)
    cond_ts = None
    if cond is not None:
        cond_ts = jnp.swapaxes(cond[:, :n_samples], 0, 1)  # (T, B, Cc)
    forced_ts = (
        jnp.swapaxes(forced[:, :n_samples], 0, 1)
        if forced is not None
        else None
    )
    per_lane = lane_seed is not None

    def body(state: RingState, inp):
        t, cond_t, forced_t = inp
        if per_lane:
            rng, key = state.rng, None
        else:
            rng, key = jax.random.split(state.rng)
        new_embed, new_bufs, logits = step_fn(
            params, arch, state, t, state.prev_class, cond_t=cond_t, gcond=gcond
        )
        if per_lane:
            cls = _sample_class_perlane(
                logits, temperature, lane_seed, t - lane_t0,
                lane_inv_temp=lane_inv_temp,
            )
        else:
            cls = _sample_class(key, logits, temperature)
        if forced_t is not None:
            cls = jnp.where(forced_t >= 0, forced_t, cls)
        new_state = RingState(new_embed, new_bufs, cls, rng)
        out = (cls, logits) if return_logits else cls
        return new_state, out

    ts = t0 + jnp.arange(n_samples, dtype=jnp.int32)
    xs = (
        ts,
        cond_ts if cond_ts is not None else ts,  # placeholder xs when no cond
        forced_ts if forced_ts is not None else ts,
    )

    def body_wrap(state, inp):
        t, c, f = inp
        return body(
            state,
            (
                t,
                c if cond_ts is not None else None,
                f if forced_ts is not None else None,
            ),
        )

    return jax.lax.scan(body_wrap, state, xs)


def _generate_classes_fused(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    b: int,
    n_samples: int,
    cond: Optional[jnp.ndarray],
    gcond: Optional[jnp.ndarray],
    forced: Optional[jnp.ndarray],
    temperature: float,
    engine: str = "turbo",
    return_logits: bool = False,
    mega_vmem_d: int = 1,
    mega_pad_test: int = 1,
    global_rng: bool = False,
):
    """Fully-fused engines.

    "turbo": lax.scan whose body is ONE kernel launch (ops/pallas/ar_turbo).
    "mega":  the entire loop inside ONE pallas_call with grid over samples
             (ops/pallas/ar_mega) — no scan, no per-step launches at all.

    Default sampling is the per-lane counter hash (lane seeds derived from
    the session rng); global_rng=True restores the session-global platform
    PRNG chain. Any input_kernel >= 1 is supported: the kernels carry the
    K-1 past input-conv embeddings as an explicit stack (r3; the K = 2
    production case carries exactly one).
    """
    interpret = jax.default_backend() == "cpu"

    # Fold global conditioning into the per-step conditioning vector.
    cond_ts = None
    if cond is not None:
        cond_ts = jnp.swapaxes(cond[:, :n_samples], 0, 1)  # (T, B, Cc)
    lp, cond_ts = _fold_gcond(
        params, params["layers"], cond_ts, gcond, n_samples
    )
    has_cond = cond_ts is not None

    if forced is None:
        forced_ts = jnp.full((n_samples, b), -1, jnp.int32)
    else:
        forced_ts = jnp.swapaxes(forced[:, :n_samples], 0, 1).astype(jnp.int32)

    h0, e0 = _fused_frontend_zero(params, arch, b)
    bufs = jnp.zeros((sum(arch.dilations), b, arch.residual_channels))
    seed_base = _seed_base(rng)
    per_lane = temperature > 0.0 and not global_rng

    if engine == "mega":
        from .ops.pallas.ar_mega import mega_generate

        # The kernel's manual ring-buffer DMA needs batch % 128 == 0 on real
        # TPUs; pad extra lanes (teacher-forced to class 0 — deterministic,
        # discarded below) so ANY batch size works. Interpret mode has no
        # lane restriction; mega_pad_test (WAVENET_MEGA_PAD_TEST, read in
        # the non-jitted wrapper) exercises the padding logic on CPU.
        pad_multiple = 128 if not interpret else mega_pad_test
        pad = (-b) % pad_multiple
        if pad:
            forced_ts = jnp.concatenate(
                [forced_ts, jnp.zeros((n_samples, pad), jnp.int32)], axis=1
            )
            if cond_ts is not None:
                cond_ts = jnp.concatenate(
                    [cond_ts, jnp.zeros(
                        (n_samples, pad, cond_ts.shape[-1]), cond_ts.dtype
                    )], axis=1
                )
            # h0/e0 rows are identical across lanes (built from the zero
            # class) — replicate the first lane.
            h0 = jnp.concatenate(
                [h0, jnp.broadcast_to(h0[:1], (pad,) + h0.shape[1:])], axis=0
            )
            e0 = jnp.concatenate(
                [e0, jnp.broadcast_to(
                    e0[:, :1], e0.shape[:1] + (pad,) + e0.shape[2:]
                )], axis=1
            )

        lane = None
        if per_lane:
            # Default fused-engine sampling: stateless per-lane hash; lane
            # seeds derived from the session seed, lane-local time == t.
            lane = jnp.stack([
                derive_lane_seeds(seed_base, b + pad),
                jnp.zeros((b + pad,), jnp.int32),
            ])
        out = mega_generate(
            params,
            lp,
            arch,
            h0,
            e0,
            seed_base,
            forced_ts[:, None, :],
            cond_ts,
            n_samples,
            temperature,
            has_cond,
            interpret=interpret,
            emit_logits=return_logits,
            vmem_dmax=mega_vmem_d,
            lane=lane,
        )
        if return_logits:
            classes, logits = out
            return (
                jnp.swapaxes(classes[:, 0, :], 0, 1)[:b],      # (B, T)
                jnp.transpose(logits, (2, 0, 1))[:b],          # (B, T, Q)
            )
        return jnp.swapaxes(out[:, 0, :], 0, 1)[:b]  # (T, B) -> (B, T)

    lane = None
    if per_lane:
        lane = jnp.stack(
            [derive_lane_seeds(seed_base, b), jnp.zeros((b,), jnp.int32)]
        )
    _, out = _turbo_scan(
        params, lp, arch, (bufs, e0, h0), seed_base, jnp.int32(0),
        cond_ts, forced_ts, temperature, has_cond, interpret, lane=lane,
        emit_logits=return_logits,
    )
    if return_logits:
        classes, logits = out
        return (
            jnp.swapaxes(classes, 0, 1),
            jnp.swapaxes(logits, 0, 1),      # (T, B, Q) -> (B, T, Q)
        )
    return jnp.swapaxes(out, 0, 1)


def _turbo_scan(params, lp, arch: ArchConfig, carry0, seed_base, t0,
                cond_ts, forced_ts, temperature, has_cond, interpret,
                lane=None, emit_logits=False):
    """lax.scan of the fused turbo step; carry = (bufs, e, h). Absolute
    time t0 + i drives ring slots and the sampling-seed chain, so chunked
    (streaming) and one-shot runs produce identical sequences. `lane`
    (2, B) int32 [seeds; lease times] switches sampling to the per-lane
    counter hash (the default — _generate_classes_fused). Returns
    (final carry, classes (T, B))."""
    from .ops.pallas.ar_turbo import turbo_step

    offsets = jnp.asarray(buffer_offsets(arch), jnp.int32)
    dils = jnp.asarray(arch.dilations, jnp.int32)
    n_steps = forced_ts.shape[0]

    def body(carry, inp):
        bufs, e_cur, h0 = carry
        t, cond_t, forced_t = inp
        slots = offsets + jax.lax.rem(t, dils)
        seed = jnp.stack([seed_base + t, t])
        outs = turbo_step(
            params, lp, arch, h0, e_cur, bufs, slots, seed,
            forced_t[:, None], cond_t=cond_t, temperature=temperature,
            has_cond=has_cond, interpret=interpret, lane=lane,
            emit_logits=emit_logits,
        )
        if emit_logits:
            new_bufs, cls, e_next, h0_next, logits = outs
            return (new_bufs, e_next, h0_next), (cls, logits)
        new_bufs, cls, e_next, h0_next = outs
        return (new_bufs, e_next, h0_next), cls

    ts = t0 + jnp.arange(n_steps, dtype=jnp.int32)
    xs = (ts, cond_ts if has_cond else ts, forced_ts)

    def body_wrap(carry, inp):
        t, c, f = inp
        return body(carry, (t, c if has_cond else None, f))

    return jax.lax.scan(body_wrap, carry0, xs)


def _tr(x):
    return jnp.swapaxes(x, -1, -2)


def _tp_weights(params: Params, lp: dict, has_cond: bool) -> dict:
    """Feature-major weight views for the TP fused step (ar_tp.py), built
    once per trace. Mirrors ar_mega's operand prep: merged tap contraction
    (wcat), merged res+skip output (wrs — the skip part may be a model-axis
    slice; shapes flow through), transposed post/embed/input-conv mats."""
    pp = params["post"]
    w_in = params["input_conv"]["w"]
    k = w_in.shape[0]
    fm = {
        "wcat": _tr(jnp.concatenate([lp["w_cur"], lp["w_prev"]], axis=1)),
        "b": lp["b"][:, :, None],
        "wrs": jnp.concatenate([_tr(lp["w_res"]), _tr(lp["w_skip"])], axis=1),
        "brs": jnp.concatenate([lp["b_res"], lp["b_skip"]], axis=1)[:, :, None],
        "w1T": _tr(pp["w1"]),               # (S, S_local)
        "b1": pp["b1"][:, None],
        "w2T": _tr(pp["w2"]),
        "b2": pp["b2"][:, None],
        "embT": _tr(params["embed"]),
        "wicurT": _tr(w_in[k - 1]),
        "bi": params["input_conv"]["b"][:, None],
        "wipastT": jnp.swapaxes(w_in[: k - 1], 1, 2),
    }
    if has_cond:
        fm["wcond"] = _tr(lp["w_cond"])
    return fm


def _perlane_gumbel_fm(lane, t_abs, q: int):
    """(Q, B) Gumbel noise from the per-lane counter hash, feature-major —
    the SAME per-(lane, t_local, class) values as perlane_gumbel and the
    in-kernel turbo/mega samplers (ar_mega._perlane_bits)."""
    s = lane[0][None, :].astype(jnp.uint32)               # (1, B)
    tl = (t_abs - lane[1])[None, :].astype(jnp.uint32)    # (1, B)
    qi = jax.lax.broadcasted_iota(jnp.uint32, (q, lane.shape[1]), 0)
    x = _perlane_mix(s + tl * jnp.uint32(_PL_T) + qi * jnp.uint32(_PL_Q))
    u = (
        jax.lax.shift_right_logical(x, jnp.uint32(8)).astype(jnp.float32)
        + 0.5
    ) * (1.0 / (1 << 24))
    return -jnp.log(-jnp.log(u))


def _tp_scan(params, fm, arch: ArchConfig, carry0, t0, cond_ts, forced_ts,
             temperature: float, has_cond: bool, interpret: bool,
             model_axis: str, lane=None, lane_inv_temp=None):
    """Scan of the TP fused step: kernel through the LOCAL skip accumulator,
    then ONE psum completes the post hidden; sampling (per-lane hash or
    greedy) and the next step's frontend run in XLA feature-major, mirroring
    the mega kernel's op order exactly (ar_tp.py module doc). carry =
    (bufs (sum_d, C, B), h (C, B), e_s ((K-1)C, B)). Returns
    (final carry, classes (T, B))."""
    from .ops.pallas.ar_tp import tp_fused_stack

    dt = jnp.dtype(arch.compute_dtype)
    offsets = jnp.asarray(buffer_offsets(arch), jnp.int32)
    dils = jnp.asarray(arch.dilations, jnp.int32)
    n_steps = forced_ts.shape[0]
    c = arch.residual_channels
    k_taps = arch.input_kernel

    def mm(w, a):
        return jax.lax.dot_general(
            w.astype(dt), a.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(carry, inp):
        bufs, h, e_s = carry
        t, cond_t, forced_t = inp
        slots = offsets + jax.lax.rem(t, dils)
        cond_fm = _tr(cond_t) if cond_t is not None else None  # (Cc, B)
        new_bufs, skip_local = tp_fused_stack(
            fm, arch, h, bufs, slots, cond_t=cond_fm, interpret=interpret
        )
        # The entire collective budget of model-sharded synthesis: one psum
        # of the (S, B) partial post hidden per STEP (docs/kernels.md).
        part = mm(fm["w1T"], jax.nn.relu(skip_local))
        hidden = jax.nn.relu(
            jax.lax.psum(part, model_axis) + fm["b1"]
        )
        logits = mm(fm["w2T"], hidden) + fm["b2"]              # (Q, B)
        q, b = logits.shape
        if temperature > 0.0:
            gum = _perlane_gumbel_fm(lane, t, q)
            if lane_inv_temp is not None:
                # Per-lane temperature (serving): inv == host f32(1/tau),
                # 0 = greedy lane (see _sample_class_perlane).
                inv = lane_inv_temp.astype(jnp.float32)[None, :]  # (1, B)
                scores = jnp.where(inv > 0.0, logits * inv + gum, logits)
            else:
                scores = logits * (1.0 / temperature) + gum
        else:
            scores = logits
        # First-max argmax (mega's in-kernel tie semantics).
        m = jnp.max(scores, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, (q, b), 0)
        cls = jnp.min(
            jnp.where(scores >= m, row, jnp.int32(q)), axis=0
        ).astype(jnp.int32)
        cls = jnp.where(forced_t >= 0, forced_t, cls)

        onehot = (row == cls[None, :]).astype(jnp.float32)
        e_next = mm(fm["embT"], onehot)                        # (C, B)
        h_new = fm["bi"] + mm(fm["wicurT"], e_next)
        for j in range(k_taps - 1):
            h_new = h_new + mm(fm["wipastT"][j], e_s[j * c : (j + 1) * c])
        new_es = (
            jnp.concatenate([e_s[c:], e_next], axis=0)
            if k_taps > 1 else e_s
        )
        return (new_bufs, h_new, new_es), cls

    ts = t0 + jnp.arange(n_steps, dtype=jnp.int32)
    xs = (ts, cond_ts if has_cond else ts, forced_ts)

    def body_wrap(carry, inp):
        t, cond_t, forced_t = inp
        return body(carry, (t, cond_t if has_cond else None, forced_t))

    return jax.lax.scan(body_wrap, carry0, xs)


def _generate_classes_tp(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    b: int,
    n_samples: int,
    cond: Optional[jnp.ndarray],
    gcond: Optional[jnp.ndarray],
    forced: Optional[jnp.ndarray],
    temperature: float,
    model_axis: str,
):
    """One-shot model-sharded generation at mega-kernel speed (inside
    shard_map only — parallel/synthesis._skip_sharded_generate places the
    skip-sliced params and supplies `model_axis`)."""
    interpret = jax.default_backend() == "cpu"
    cond_ts = None
    if cond is not None:
        cond_ts = jnp.swapaxes(cond[:, :n_samples], 0, 1)  # (T, B, Cc)
    lp, cond_ts = _fold_gcond(
        params, params["layers"], cond_ts, gcond, n_samples
    )
    has_cond = cond_ts is not None
    if forced is None:
        forced_ts = jnp.full((n_samples, b), -1, jnp.int32)
    else:
        forced_ts = jnp.swapaxes(forced[:, :n_samples], 0, 1).astype(jnp.int32)

    h0, e0 = _fused_frontend_zero(params, arch, b)
    from .ops.pallas.ar_mega import estack_feature_major

    carry0 = (
        jnp.zeros((sum(arch.dilations), arch.residual_channels, b)),
        _tr(h0).astype(jnp.float32),
        estack_feature_major(e0),
    )
    seed_base = _seed_base(rng)
    lane = None
    if temperature > 0.0:
        lane = jnp.stack(
            [derive_lane_seeds(seed_base, b), jnp.zeros((b,), jnp.int32)]
        )
    fm = _tp_weights(params, lp, has_cond)
    _, out = _tp_scan(
        params, fm, arch, carry0, jnp.int32(0), cond_ts, forced_ts,
        temperature, has_cond, interpret, model_axis, lane=lane,
    )
    return jnp.swapaxes(out, 0, 1)  # (T, B) -> (B, T)


def _tp_stream_chunk(
    params: Params,
    arch: ArchConfig,
    stream,
    chunk_size: int,
    cond,
    gcond,
    forced,
    temperature: float,
    model_axis: str,
    lane_seed=None,
    lane_t0=None,
    lane_inv_temp=None,
):
    """One model-sharded chunk on the TP fused step (see _tp_scan): the
    carried state is the feature-major (bufs, h, e_s) triple; ring-slot
    phase and the per-lane hash use the ABSOLUTE time stream.t + step, so
    chunked output bit-matches the one-shot TP run."""
    interpret = jax.default_backend() == "cpu"
    st = stream.state
    b = st["h"].shape[-1]
    cond_ts = jnp.swapaxes(cond, 0, 1) if cond is not None else None
    lp, cond_ts = _fold_gcond(
        params, params["layers"], cond_ts, gcond, chunk_size
    )
    has_cond = cond_ts is not None
    if forced is None:
        forced_ts = jnp.full((chunk_size, b), -1, jnp.int32)
    else:
        forced_ts = jnp.swapaxes(forced, 0, 1).astype(jnp.int32)
    lane = None
    if lane_seed is not None:
        lane = jnp.stack(
            [lane_seed.astype(jnp.int32), lane_t0.astype(jnp.int32)]
        )
    fm = _tp_weights(params, lp, has_cond)
    (bufs, h, e_s), out = _tp_scan(
        params, fm, arch, (st["bufs"], st["h"], st["e_s"]), stream.t,
        cond_ts, forced_ts, temperature, has_cond, interpret, model_axis,
        lane=lane, lane_inv_temp=lane_inv_temp,
    )
    new_stream = Stream(
        {"bufs": bufs, "h": h, "e_s": e_s, "seed_base": st["seed_base"]},
        stream.t + jnp.int32(chunk_size),
    )
    return jnp.swapaxes(out, 0, 1), new_stream


def _tp_reset_lanes(params: Params, arch: ArchConfig, stream, lane_mask):
    """reset_lanes for the TP stream state (feature-major: lanes are the
    LAST dim of every carried array); same zero-ring argument as the other
    engines (see reset_lanes)."""
    from .ops.pallas.ar_mega import estack_feature_major

    st = stream.state
    b = st["h"].shape[-1]
    h0, e0 = _fused_frontend_zero(params, arch, b)
    col = lane_mask[None, :]
    return Stream(
        {
            "bufs": jnp.where(lane_mask[None, None, :], 0.0, st["bufs"]),
            "h": jnp.where(col, _tr(h0).astype(jnp.float32), st["h"]),
            "e_s": jnp.where(col, estack_feature_major(e0), st["e_s"]),
            "seed_base": st["seed_base"],
        },
        stream.t,
    )


class Stream(NamedTuple):
    """Carried state for incremental (chunked) synthesis.

    `state` is a RingState for the scan engines (xla/pallas) or a dict
    carry for the mega engine — pass the SAME engine to every stream_chunk
    call of a session.
    """

    state: object
    t: jnp.ndarray  # () int32: absolute sample index of the next step


def _fused_frontend_zero(params: Params, arch: ArchConfig, batch: int):
    """(h0, estack0) for the zero-class first step of the fused engines.

    h0 is the width-K causal input conv's output at t=0 (all past
    embeddings are the zero padding, so only the current tap contributes);
    estack0 is the (K-1, B, C) carried embedding stack, oldest tap first —
    zeros except the last row, which holds e(0) (the zero class's
    embedding). K == 1 carries an empty (0, B, C) stack (never entering a
    kernel — the input conv then has no memory)."""
    dtype = jnp.dtype(arch.compute_dtype)
    k = arch.input_kernel
    c = arch.residual_channels
    zero_cls = jnp.full((batch,), arch.quant_channels // 2, jnp.int32)
    e0 = params["embed"][zero_cls]
    w_in = params["input_conv"]["w"]
    h0 = params["input_conv"]["b"].astype(jnp.float32) + _mm(
        e0, w_in[k - 1], dtype
    )
    estack0 = jnp.zeros((k - 1, batch, c), jnp.float32)
    if k > 1:
        estack0 = estack0.at[k - 2].set(e0.astype(jnp.float32))
    return h0, estack0


def _seed_base(rng: jax.Array) -> jnp.ndarray:
    # Bound independent of length: seed_base + t stays far from int32
    # overflow, and one-shot and streaming runs derive the IDENTICAL seed
    # chain from the same rng (absolute time) — so they bit-match.
    return jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max // 2)


MEGA_LANE_MULTIPLE = 128


def stream_lane_multiple(engine: str) -> int:
    """Lane-count granularity of a streaming session for `engine`.

    The mega kernel's manual ring DMA needs batch % 128 == 0 on real TPUs;
    CPU interpret mode has no restriction (tests set WAVENET_MEGA_PAD_TEST
    to a small multiple to exercise the padding logic). Other engines
    stream at any batch.
    """
    if engine != "mega":
        return 1
    if jax.default_backend() == "cpu":
        import os as _os

        return int(_os.environ.get("WAVENET_MEGA_PAD_TEST", "1"))
    return MEGA_LANE_MULTIPLE


def padded_stream_batch(batch: int, engine: str) -> int:
    """Smallest engine-streamable session batch >= `batch`.

    Auto-padding serving surfaces (SessionPool, `wavenet generate
    --stream-chunk`) open the session at this size and slice the pad lanes
    off on the host — the pad lanes free-run as throwaways, so the fastest
    engine serves ARBITRARY pool sizes (VERDICT r1 item 6)."""
    m = stream_lane_multiple(engine)
    return -(-batch // m) * m


def start_stream(
    arch: ArchConfig,
    batch: int,
    rng: jax.Array,
    engine: str = "xla",
    params: Optional[Params] = None,
    model_axis: Optional[str] = None,
) -> Stream:
    """Open a streaming-synthesis session (see stream_chunk).

    engine "xla"/"pallas" (scan engines; any batch), "turbo" (fused step
    kernel per sample; any batch) or "mega" (whole-chunk kernel, the
    fastest; batch % 128 == 0 on TPU — open the session at
    `padded_stream_batch(batch, "mega")` and slice the pad lanes off, as
    SessionPool and the CLI do, to serve any logical batch). The fused
    engines need `params` here to seed their in-kernel state.

    `model_axis` (inside shard_map only — parallel/synthesis places the
    skip-sliced params): turbo/mega sessions then carry the feature-major
    TP step state (ar_tp.py) instead of the in-kernel carries; any batch
    (no 128-lane DMA constraint). Scan engines keep their RingState (the
    skip slice only changes per-chunk math, not the carried state).
    """
    if engine in ("mega", "turbo") and model_axis is not None:
        if params is None:
            raise ValueError(f"start_stream(engine='{engine}') needs params")
        h0, e0 = _fused_frontend_zero(params, arch, batch)
        from .ops.pallas.ar_mega import estack_feature_major

        state = {
            "bufs": jnp.zeros(
                (sum(arch.dilations), arch.residual_channels, batch)
            ),
            "h": _tr(h0).astype(jnp.float32),
            "e_s": estack_feature_major(e0),
            "seed_base": _seed_base(rng),
        }
        return Stream(state, jnp.int32(0))
    if engine in ("mega", "turbo"):
        if params is None:
            raise ValueError(f"start_stream(engine='{engine}') needs params")
        h0, e0 = _fused_frontend_zero(params, arch, batch)
        if engine == "mega":
            from .ops.pallas.ar_mega import mega_zero_carry

            state = {
                "carry": mega_zero_carry(arch, h0, e0),
                "seed_base": _seed_base(rng),
            }
        else:
            state = {
                "bufs": jnp.zeros(
                    (sum(arch.dilations), batch, arch.residual_channels)
                ),
                "e": e0,
                "h": h0,
                "seed_base": _seed_base(rng),
            }
        return Stream(state, jnp.int32(0))
    return Stream(init_ring_state(arch, batch, rng), jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "chunk_size", "temperature", "engine", "return_logits",
        "global_rng", "model_axis",
    ),
)
def stream_chunk(
    params: Params,
    arch: ArchConfig,
    stream: Stream,
    chunk_size: int,
    cond: Optional[jnp.ndarray] = None,       # (B, chunk, Cc) upsampled
    speaker_ids: Optional[jnp.ndarray] = None,
    forced: Optional[jnp.ndarray] = None,     # (B, chunk), -1 = free-running
    temperature: float = 1.0,
    engine: str = "xla",
    return_logits: bool = False,
    lane_seed: Optional[jnp.ndarray] = None,  # (B,) int32 per-lane seeds
    lane_t0: Optional[jnp.ndarray] = None,    # (B,) int32 lane lease times
    global_rng: bool = False,
    model_axis: Optional[str] = None,
    lane_inv_temp: Optional[jnp.ndarray] = None,  # (B,) f32 1/tau (0=greedy)
):
    """Emit the next chunk_size samples and the advanced stream.

    Real-time/production serving: the ring-buffer state is O(receptive
    field) regardless of emitted length, so a session can run forever with
    one compile per chunk size. The ring-slot phase and RNG chain continue
    across chunks exactly, so the concatenated chunked output BIT-MATCHES a
    single generate_classes call of the same total length (tested in
    tests/test_generate.py). Engines: "xla" | "pallas" (scan engines, any
    batch, logits available) | "turbo" (fused step kernel, any batch) |
    "mega" (whole-chunk kernel, fastest, batch % 128 == 0 on TPU).

    Sampling: the fused engines (turbo/mega) default to the per-lane
    counter hash with seeds derived from the stream's seed_base and
    lane-local time == absolute time — matching the one-shot default.
    Explicit lane_seed/lane_t0 (serving pools) override the derivation;
    global_rng=True opts back into the session-global platform PRNG chain.
    The scan engines (xla/pallas) default to the shared threefry chain
    (the bit-matching/naive-oracle tier) unless lane_seed is given.

    Returns (classes (B, chunk)[, logits], new_stream).
    """
    if cond is not None and cond.shape[1] != chunk_size:
        # Refuse a longer (whole-utterance) cond array: this function has
        # no notion of where in it the stream is, so it would silently
        # reuse frames [0:chunk_size) every chunk. Callers slice the
        # upsampled conditioning to THIS chunk's span themselves
        # (cond_full[:, t0 : t0 + chunk_size]).
        raise ValueError(
            f"stream_chunk cond must cover exactly this chunk: expected "
            f"(B, {chunk_size}, Cc), got {cond.shape}"
        )
    if forced is not None and forced.shape[1] != chunk_size:
        raise ValueError(
            f"stream_chunk forced must be (B, {chunk_size}), got "
            f"{forced.shape}"
        )
    if (lane_seed is None) != (lane_t0 is None):
        raise ValueError("pass lane_seed and lane_t0 together")
    if lane_inv_temp is not None:
        # Per-lane temperature rides the per-lane hash sampler: the static
        # temperature must enable the sampling machinery (greedy lanes are
        # expressed as inv == 0), and the session-global PRNG chain has no
        # per-lane replay semantics to attach it to.
        if temperature <= 0.0:
            raise ValueError(
                "lane_inv_temp needs a sampled session (static "
                "temperature > 0); greedy lanes are inv == 0"
            )
        if global_rng:
            raise ValueError("lane_inv_temp needs per-lane sampling, "
                             "not global_rng")
    gcond = None
    if speaker_ids is not None:
        gcond = params["speaker_embed"][speaker_ids]

    if model_axis is not None and engine in ("mega", "turbo"):
        # Model-sharded streaming (r4): the TP step state (ar_tp.py) is
        # carried instead of the in-kernel mega/turbo carries; one psum
        # per step, same as the one-shot TP path.
        if return_logits:
            raise ValueError(
                "return_logits is not supported on the model-axis fused TP "
                "path"
            )
        if global_rng and temperature > 0.0:
            raise ValueError(
                "global_rng sampling is not available under model-axis "
                "streaming; use per-lane seeds (the default) or greedy"
            )
        b_dev = stream.state["h"].shape[-1]
        if lane_seed is None and temperature > 0.0:
            lane_seed = derive_lane_seeds(stream.state["seed_base"], b_dev)
            lane_t0 = jnp.zeros((b_dev,), jnp.int32)
        return _tp_stream_chunk(
            params, arch, stream, chunk_size, cond, gcond, forced,
            temperature, model_axis, lane_seed, lane_t0,
            lane_inv_temp=lane_inv_temp,
        )

    if engine in ("mega", "turbo") and lane_seed is None and (
        temperature > 0.0 and not global_rng
    ):
        # Fused-engine default sampling == the one-shot default: per-lane
        # hash, seeds derived from the session seed, lane time == absolute
        # time (so chunked output still bit-matches one-shot).
        b_dev = (
            stream.state["carry"]["h_s"].shape[-1] if engine == "mega"
            else stream.state["h"].shape[0]
        )
        lane_seed = derive_lane_seeds(stream.state["seed_base"], b_dev)
        lane_t0 = jnp.zeros((b_dev,), jnp.int32)

    if engine == "mega":
        return _mega_stream_chunk(
            params, arch, stream, chunk_size, cond, gcond, forced,
            temperature, return_logits, lane_seed, lane_t0,
            lane_inv_temp=lane_inv_temp,
        )
    if engine == "turbo":
        return _turbo_stream_chunk(
            params, arch, stream, chunk_size, cond, gcond, forced,
            temperature, lane_seed, lane_t0,
            return_logits=return_logits, lane_inv_temp=lane_inv_temp,
        )

    if lane_inv_temp is not None and lane_seed is None:
        raise ValueError(
            "lane_inv_temp on the scan engines needs explicit "
            "lane_seed/lane_t0 (the per-lane sampling path)"
        )
    new_state, out = _run_scan_engine(
        params, arch, stream.state, stream.t, chunk_size, cond, forced,
        gcond, temperature, return_logits, engine,
        lane_seed=lane_seed, lane_t0=lane_t0, model_axis=model_axis,
        lane_inv_temp=lane_inv_temp,
    )
    new_stream = Stream(new_state, stream.t + jnp.int32(chunk_size))
    if return_logits:
        classes, logits = out
        return (
            jnp.swapaxes(classes, 0, 1),
            jnp.swapaxes(logits, 0, 1),
            new_stream,
        )
    return jnp.swapaxes(out, 0, 1), new_stream


def _fold_gcond(params: Params, lp: dict, cond_ts, gcond, n_steps: int):
    """Fold global (speaker) conditioning into the per-step cond stream —
    the fused kernels see one concatenated conditioning input."""
    if gcond is None:
        return lp, cond_ts
    g_ts = jnp.broadcast_to(gcond[None], (n_steps,) + gcond.shape)
    lp = dict(lp)
    if cond_ts is not None:
        cond_ts = jnp.concatenate([cond_ts, g_ts], axis=-1)
        lp["w_cond"] = jnp.concatenate(
            [params["layers"]["w_cond"], params["layers"]["w_gcond"]],
            axis=1,
        )
    else:
        cond_ts = g_ts
        lp["w_cond"] = params["layers"]["w_gcond"]
    return lp, cond_ts


def _turbo_stream_chunk(
    params: Params,
    arch: ArchConfig,
    stream: Stream,
    chunk_size: int,
    cond,
    gcond,
    forced,
    temperature: float,
    lane_seed=None,
    lane_t0=None,
    return_logits: bool = False,
    lane_inv_temp=None,
):
    """One turbo-engine chunk: lax.scan of the fully-fused step kernel,
    carrying (rings, frontend) between chunks. Ring-slot phase and the
    in-kernel sampling-seed chain use the ABSOLUTE time stream.t + step, so
    chunked output continues the one-shot turbo sequence exactly."""
    interpret = jax.default_backend() == "cpu"
    st = stream.state
    b = st["h"].shape[0]
    cond_ts = jnp.swapaxes(cond, 0, 1) if cond is not None else None
    lp, cond_ts = _fold_gcond(
        params, params["layers"], cond_ts, gcond, chunk_size
    )
    has_cond = cond_ts is not None
    if forced is None:
        forced_ts = jnp.full((chunk_size, b), -1, jnp.int32)
    else:
        forced_ts = jnp.swapaxes(forced, 0, 1).astype(jnp.int32)
    seed_base = st["seed_base"]
    lane = _pack_lane(lane_seed, lane_t0, lane_inv_temp)
    (bufs, e, h), out = _turbo_scan(
        params, lp, arch, (st["bufs"], st["e"], st["h"]), seed_base,
        stream.t, cond_ts, forced_ts, temperature, has_cond, interpret,
        lane=lane, emit_logits=return_logits,
    )
    new_stream = Stream(
        {"bufs": bufs, "e": e, "h": h, "seed_base": seed_base},
        stream.t + jnp.int32(chunk_size),
    )
    if return_logits:
        classes, logits = out
        return (
            jnp.swapaxes(classes, 0, 1),
            jnp.swapaxes(logits, 0, 1),
            new_stream,
        )
    return jnp.swapaxes(out, 0, 1), new_stream


def _mega_stream_chunk(
    params: Params,
    arch: ArchConfig,
    stream: Stream,
    chunk_size: int,
    cond,
    gcond,
    forced,
    temperature: float,
    return_logits: bool,
    lane_seed=None,
    lane_t0=None,
    lane_inv_temp=None,
):
    """One mega-engine chunk: the whole chunk in ONE pallas_call, carrying
    (ring buffer, staged pairs, frontend) between chunks. Ring-slot phase
    and the in-kernel sampling-seed chain use the ABSOLUTE time stream.t +
    step, so chunked output continues the one-shot mega sequence exactly."""
    from .ops.pallas.ar_mega import mega_generate

    interpret = jax.default_backend() == "cpu"
    carry = stream.state["carry"]
    b = carry["h_s"].shape[-1]
    if not interpret and b % 128 != 0:
        raise ValueError(
            f"mega streaming needs batch % 128 == 0 on TPU, got {b}; use "
            "the pallas engine or pad the session batch"
        )
    # Fold global conditioning into the per-step conditioning (same scheme
    # as the one-shot fused path).
    cond_ts = jnp.swapaxes(cond, 0, 1) if cond is not None else None
    lp, cond_ts = _fold_gcond(
        params, params["layers"], cond_ts, gcond, chunk_size
    )
    has_cond = cond_ts is not None
    if forced is None:
        forced_ts = jnp.full((chunk_size, b), -1, jnp.int32)
    else:
        forced_ts = jnp.swapaxes(forced, 0, 1).astype(jnp.int32)

    lane = _pack_lane(lane_seed, lane_t0, lane_inv_temp)
    dummy_be = jnp.swapaxes(carry["h_s"], 0, 1)  # (B, C): shape source only
    out = mega_generate(
        params, lp, arch, dummy_be, dummy_be,
        stream.state["seed_base"],
        forced_ts[:, None, :], cond_ts, chunk_size, temperature, has_cond,
        interpret=interpret, emit_logits=return_logits,
        streaming=True, carry=carry, t0=stream.t, lane=lane,
    )
    if return_logits:
        classes, logits, new_carry = out
    else:
        classes, new_carry = out
        logits = None
    new_stream = Stream(
        {"carry": new_carry, "seed_base": stream.state["seed_base"]},
        stream.t + jnp.int32(chunk_size),
    )
    cls_bt = jnp.swapaxes(classes[:, 0, :], 0, 1)  # (B, T)
    if return_logits:
        return cls_bt, jnp.transpose(logits, (2, 0, 1)), new_stream
    return cls_bt, new_stream


@functools.partial(jax.jit, static_argnames=("arch", "engine", "model_axis"))
def reset_lanes(
    params: Params,
    arch: ArchConfig,
    stream: Stream,
    lane_mask: jnp.ndarray,  # (B,) bool: True = recycle this lane
    engine: str = "xla",
    model_axis: Optional[str] = None,
) -> Stream:
    """Continuous batching: reset the masked lanes to a fresh session start.

    Production serving runs many concurrent sessions as lanes of one
    fixed-shape streaming batch (compiled once); when a session finishes,
    its lane is recycled for the next request in place — no batch restart,
    no recompile, other lanes unaffected. The reference has no serving
    tier; this is the TPU-native equivalent of continuous batching in LLM
    servers, adapted to ring-buffer AR state.

    Why zeroing works at any global phase: each layer's ring is read at
    slot (t mod d) *before* being written at the same slot, so a lane whose
    ring columns are all zero sees exactly the all-zero pre-start context a
    t=0 session sees, regardless of the session-global step the reset
    happens at. Greedy/teacher-forced output of a recycled lane is
    therefore BIT-IDENTICAL to a fresh session (tests/test_continuous.py).

    RNG: the sampling chain is session-global (one seed per step for the
    whole batch), so a recycled lane draws fresh independent randomness but
    not the same stream a standalone session would — per-request sampled
    reproducibility needs a dedicated session; xla and pallas engines still
    bit-match EACH OTHER after resets (shared chain).
    """
    lane_mask = lane_mask.astype(bool)
    st = stream.state
    if model_axis is not None and engine in ("mega", "turbo"):
        # TP streaming state (model-sharded sessions): feature-major reset.
        return _tp_reset_lanes(params, arch, stream, lane_mask)
    if engine in ("xla", "pallas"):
        rs: RingState = st
        col = lane_mask[None, :, None]
        return Stream(
            RingState(
                embed_buf=jnp.where(col, 0.0, rs.embed_buf),
                bufs=jnp.where(col, 0.0, rs.bufs),
                prev_class=jnp.where(
                    lane_mask, arch.quant_channels // 2, rs.prev_class
                ),
                rng=rs.rng,
            ),
            stream.t,
        )
    if engine == "turbo":
        b = st["h"].shape[0]
        h0, e0 = _fused_frontend_zero(params, arch, b)
        row = lane_mask[:, None]
        return Stream(
            {
                "bufs": jnp.where(lane_mask[None, :, None], 0.0, st["bufs"]),
                "e": jnp.where(
                    lane_mask[None, :, None], e0.astype(st["e"].dtype),
                    st["e"],
                ),
                "h": jnp.where(row, h0.astype(st["h"].dtype), st["h"]),
                "seed_base": st["seed_base"],
            },
            stream.t,
        )
    if engine == "mega":
        from .ops.pallas.ar_mega import estack_feature_major

        carry = st["carry"]
        b = carry["h_s"].shape[-1]
        h0, e0 = _fused_frontend_zero(params, arch, b)
        col = lane_mask[None, :]  # feature-major (X, B): lanes are columns
        return Stream(
            {
                "carry": {
                    "bufs": jnp.where(col, 0.0, carry["bufs"]),
                    "hstate": jnp.where(col, 0.0, carry["hstate"]),
                    "h_s": jnp.where(
                        col, jnp.swapaxes(h0, 0, 1).astype(jnp.float32),
                        carry["h_s"],
                    ),
                    "e_s": jnp.where(
                        col, estack_feature_major(e0), carry["e_s"],
                    ),
                },
                "seed_base": st["seed_base"],
            },
            stream.t,
        )
    raise ValueError(f"unknown engine {engine!r}")


def generate_streaming(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    chunk_size: int,
    n_chunks: Optional[int] = None,
    temperature: float = 1.0,
    engine: str = "xla",
):
    """Host-side generator yielding decoded wav chunks (B, chunk_size) in
    [-1, 1] — unbounded when n_chunks is None."""
    stream = start_stream(arch, batch, rng, engine=engine, params=params)
    i = 0
    while n_chunks is None or i < n_chunks:
        classes, stream = stream_chunk(
            params, arch, stream, chunk_size,
            temperature=temperature, engine=engine,
        )
        yield mu_law_decode(classes, arch.quant_channels)
        i += 1


def generate(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    cond_frames: Optional[jnp.ndarray] = None,   # (B, F, n_mels) frame-rate
    speaker_ids: Optional[jnp.ndarray] = None,
    forced: Optional[jnp.ndarray] = None,        # (B, T) classes, -1 = free
    temperature: float = 1.0,
    use_pallas: bool = False,
    engine: Optional[str] = None,
    global_rng: bool = False,
) -> jnp.ndarray:
    """Synthesize waveforms (B, n_samples) in [-1, 1].

    `forced` primes the generator (the reference's primed-queue mode): any
    position with forced[b, t] >= 0 emits that class and updates state from
    it; -1 positions free-run.
    """
    cond = None
    if cond_frames is not None:
        from .models.conditioning import upsample_cond

        cond = upsample_cond(
            params["upsampler"], arch, cond_frames, jnp.dtype(arch.compute_dtype)
        )
    classes = generate_classes(
        params,
        arch,
        rng,
        batch,
        n_samples,
        cond=cond,
        speaker_ids=speaker_ids,
        forced=jnp.asarray(forced) if forced is not None else None,
        temperature=temperature,
        use_pallas=use_pallas,
        engine=engine,
        global_rng=global_rng,
    )
    return mu_law_decode(classes, arch.quant_channels)


def naive_sample(
    params: Params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    temperature: float = 1.0,
    return_logits: bool = False,
):
    """Oracle sampler: full-context forward per emitted sample, O(T·R) work.

    Mirrors the pre-Fast-WaveNet naive generation the papers compare against;
    used only in tests to pin the scan engine's semantics (identical RNG
    chain: split per step, categorical on logits/temperature).
    """
    from .models.wavenet import forward

    zero_cls = arch.quant_channels // 2
    history = jnp.full((batch, n_samples + 1), zero_cls, jnp.int32)
    all_logits = []
    for t in range(n_samples):
        rng, key = jax.random.split(rng)
        # Model input at step t: classes emitted so far, zero-class padded on
        # the left exactly like the scan engine's zero-initialized buffers...
        window = history[:, : t + 1][:, -arch.receptive_field :]
        logits = forward(params, arch, window)[:, -1]
        all_logits.append(logits)
        cls = _sample_class(key, logits, temperature)
        history = history.at[:, t + 1].set(cls)
    classes = history[:, 1:]
    if return_logits:
        return classes, jnp.stack(all_logits, axis=1)
    return classes
