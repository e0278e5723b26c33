"""Independent Fast-WaveNet FIFO-queue oracle (pure-NumPy model math).

Implements the incremental generation algorithm of "Fast Wavenet Generation
Algorithm" (arXiv 1611.09482, PAPERS.md) exactly as the paper states it:
per layer a FIFO queue of length = dilation holding that layer's past input
activations; per emitted sample, POP the dilated operand from each queue,
run the gated residual unit, PUSH the layer's new input activation. This is
a genuinely different data structure and execution model from
lb_wavenet_tpu.generate (packed HBM ring buffers carried through one
lax.scan / Pallas kernels) and shares NO code with it — it exists to pin
the framework against an external re-derivation of the algorithm, not
against itself (SURVEY.md §4 "North-star parity").

All model math is NumPy float32. Only the per-sample categorical draw goes
through jax.random, because the parity contract includes *consuming
randomness identically* to the xla engine (split the chain once per step,
categorical(key, logits / temperature)); mu-law class parity is at the
8-bit class level, which absorbs the float noise between NumPy and XLA
matmul orderings (SURVEY.md §7 "Hard parts").
"""
from __future__ import annotations

import collections
from typing import Optional

import jax
import numpy as np


# Tiny jitted helpers so the per-step RNG ops don't pay eager dispatch.
_split2 = jax.jit(lambda k: jax.random.split(k))
_categorical = jax.jit(jax.random.categorical)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _mix32_np(x: np.ndarray) -> np.ndarray:
    """NumPy mirror of the framework's per-lane hash mix (uint32 wrapping)."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    return x ^ (x >> np.uint32(16))


def _perlane_scores_np(
    logits: np.ndarray, temperature: float, lane_seed: np.ndarray, t: int
) -> np.ndarray:
    """Gumbel-perturbed scores from the per-lane counter hash — the NumPy
    re-derivation of generate.perlane_gumbel (same uint32 constants, same
    float32 arithmetic), used to pin the fused engines' DEFAULT sampling."""
    q = logits.shape[-1]
    qi = np.arange(q, dtype=np.uint32)[None, :]
    # Scalar uint32 products warn on (correct, modular) overflow in NumPy;
    # do the wrap explicitly in Python ints.
    t_term = np.uint32((int(t) * 0x9E3779B9) & 0xFFFFFFFF)
    x = _mix32_np(
        lane_seed[:, None].astype(np.uint32) + t_term
        + qi * np.uint32(0x7FEB352D)
    )
    u = ((x >> np.uint32(8)).astype(np.float32) + np.float32(0.5)) * np.float32(
        1.0 / (1 << 24)
    )
    gum = -np.log(-np.log(u))
    return logits * np.float32(1.0 / temperature) + gum


def perlane_lane_seeds_np(seed_base: int, batch: int) -> np.ndarray:
    """NumPy mirror of generate.derive_lane_seeds."""
    b = np.arange(batch, dtype=np.uint32)
    mixed = _mix32_np(np.uint32(seed_base) + b * np.uint32(0xB5297A4D))
    return (mixed & np.uint32(0x7FFFFFFF)).astype(np.int32)


def _np_params(params) -> dict:
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params
    )


def fifo_generate(
    params,
    arch,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    cond: Optional[np.ndarray] = None,        # (B, T>=n, Cc) pre-upsampled
    speaker_ids: Optional[np.ndarray] = None,  # (B,) int
    forced: Optional[np.ndarray] = None,       # (B, T) int, -1 = free-run
    temperature: float = 1.0,
    perlane: bool = False,
    perlane_seeds: Optional[np.ndarray] = None,  # (B,) explicit lane seeds
) -> np.ndarray:
    """Paper-exact FIFO-queue incremental sampler. Returns classes (B, T).

    Matches lb_wavenet_tpu.generate.generate_classes(engine="xla") class
    sequences seed-for-seed on fp32 archs (tests/test_golden.py).

    perlane=True samples via the per-lane counter hash instead of the
    threefry chain — the fused engines' (turbo/mega) DEFAULT sampled path:
    the seed base and lane seeds are derived from `rng` exactly as
    generate._seed_base / derive_lane_seeds do, and the noise math is the
    NumPy re-derivation above, so this mode pins the fused engines'
    sampled sequences seed-for-seed too.
    """
    p = _np_params(params)
    lp = p["layers"]
    g = lp["w_cur"].shape[-1] // 2
    c = arch.residual_channels
    k = arch.input_kernel

    # The paper's per-layer FIFO queues ("convolution queues"), preloaded
    # with zeros: a pop at t < d yields the zero pre-sequence context.
    queues = [
        collections.deque(
            [np.zeros((batch, c), np.float32) for _ in range(d)], maxlen=d
        )
        for d in arch.dilations
    ]
    # Input-conv queue: the K-1 past embeddings (zeros before t = 0).
    equeue = collections.deque(
        [np.zeros((batch, c), np.float32) for _ in range(k - 1)],
        maxlen=k - 1 if k > 1 else 1,
    )

    gcond = None
    if speaker_ids is not None:
        gcond = p["speaker_embed"][np.asarray(speaker_ids)]

    lane_seed = None
    if perlane_seeds is not None:
        # Explicit lane seeds — the serving contract (SessionPool
        # submit(seed=...)): the stream depends on nothing else.
        lane_seed = np.asarray(perlane_seeds, np.int32)
        perlane = True
    elif perlane:
        # Identical randomness derivation to the fused engines: ONE
        # jax.random.randint on the session key (generate._seed_base),
        # then the lane-seed hash — no further threefry consumption.
        seed_base = int(
            jax.random.randint(rng, (), 0, np.iinfo(np.int32).max // 2)
        )
        lane_seed = perlane_lane_seeds_np(seed_base, batch)

    prev = np.full((batch,), arch.quant_channels // 2, np.int64)
    out = np.zeros((batch, n_samples), np.int32)
    for t in range(n_samples):
        e = p["embed"][prev]
        # Width-K causal input conv: tap j applies to e(t - (K-1-j)); the
        # queue's left end is the oldest embedding.
        h = p["input_conv"]["b"] + e @ p["input_conv"]["w"][k - 1]
        for j in range(k - 1):
            h = h + equeue[j] @ p["input_conv"]["w"][j]
        if k > 1:
            equeue.append(e.copy())  # maxlen pops the oldest

        skip = np.zeros((batch, arch.skip_channels), np.float32)
        for i in range(len(arch.dilations)):
            h_prev = queues[i].popleft()   # h_i(t - d_i): the paper's pop
            queues[i].append(h.copy())     # push h_i(t)
            pre = h @ lp["w_cur"][i] + h_prev @ lp["w_prev"][i] + lp["b"][i]
            if cond is not None:
                pre = pre + np.asarray(cond[:, t], np.float32) @ lp["w_cond"][i]
            if gcond is not None:
                pre = pre + gcond @ lp["w_gcond"][i]
            z = np.tanh(pre[:, :g]) * _sigmoid(pre[:, g:])
            h = h + z @ lp["w_res"][i] + lp["b_res"][i]
            skip = skip + z @ lp["w_skip"][i] + lp["b_skip"][i]

        s = np.maximum(skip, 0.0)
        s = np.maximum(s @ p["post"]["w1"] + p["post"]["b1"], 0.0)
        logits = s @ p["post"]["w2"] + p["post"]["b2"]

        if temperature == 0.0:
            cls = np.argmax(logits, axis=-1).astype(np.int32)
        elif perlane:
            # Fused-engine default: Gumbel-max on the counter hash, lane
            # time == absolute t (lane_t0 == 0 for a fresh session).
            cls = np.argmax(
                _perlane_scores_np(logits, temperature, lane_seed, t),
                axis=-1,
            ).astype(np.int32)
        else:
            # Identical randomness consumption to the xla engine: one split
            # per step (even on forced steps), categorical on logits/temp.
            keys = _split2(rng)
            rng = keys[0]
            cls = np.asarray(
                _categorical(keys[1], logits / np.float32(temperature)),
                np.int32,
            )
        if forced is not None:
            f = np.asarray(forced)[:, t].astype(np.int32)
            cls = np.where(f >= 0, f, cls)
        out[:, t] = cls
        prev = cls.astype(np.int64)
    return out
