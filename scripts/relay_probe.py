"""Relay transfer probe: pin the serving delivered-throughput gap.

The r4/r5 serving record (825.5 / 828.4 delivered audio-sec/sec at
B=1536/chunk=4096 pipelined) sits at ~45% of the same shape's measured
compute ceiling (mega streaming 1793 a-s/s), while the B=512/chunk=1024
cell reaches ~93% of its ceiling. Hypothesis (docs/serving.md): in a
saturated pool every delivered sample must cross the relay D2H at
1 byte/sample, and on this image that transfer (6.29 MB per B=1536 chunk)
is slow and only PARTIALLY overlaps device execution — so the gap is the
relay, not the device program.

This probe measures the three quantities that close the arithmetic,
without any serving code in the loop:

  1. round-trip latency  — scalar fetch, median of N;
  2. D2H bandwidth       — (1536, 4096) uint8 fetch (the exact serving
                           payload shape), median of N;
  3. overlap factor      — dispatch a ~200 ms synthetic compute program
                           (async), immediately fetch an UNRELATED big
                           buffer, sync the compute; wall vs the serial
                           sum tells how much transfer hides under
                           execution on this runtime/relay.

Emits one JSON line; numbers land in BASELINE.md / docs/serving.md.

    python scripts/relay_probe.py          # TPU (default)
    WAVENET_PLATFORM=cpu python scripts/relay_probe.py   # smoke
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    reps = int(os.environ.get("BENCH_REPS", "10"))
    B = int(os.environ.get("BENCH_BATCH", "1536"))
    chunk = int(os.environ.get("BENCH_CHUNK", "4096"))

    # Device-materialized payload (no H2D in the making of it). NOTE a
    # jax.Array CACHES its host copy after the first np.asarray — every
    # timed fetch below must be of a FRESH array, synced (scalar-sum
    # round trip) before the fetch is timed so only D2H is on the clock.
    make = jax.jit(
        lambda s: ((jax.lax.iota(jnp.int32, B * chunk) + s) % 251)
        .astype(jnp.uint8).reshape(B, chunk)
    )
    jsum = jax.jit(lambda x: x.sum())

    def fresh_payload(s):
        p = make(jnp.int32(s))
        np.asarray(jsum(p))  # p's producer has completed; p not yet fetched
        return p

    np.asarray(fresh_payload(0))  # compile + settle

    # A ~hundreds-of-ms synthetic compute program: chained matmuls under
    # scan (serial dependency — XLA cannot elide or parallelize it).
    # Sized so the TPU wall is ~200 ms — the real serving chunk's compute
    # (B=1536 x chunk=4096 at the 1793 a-s/s mega streaming ceiling).
    n_mm = int(os.environ.get("BENCH_MM", "4000"))
    M = 1024

    @jax.jit
    def burn(x):
        def body(c, _):
            c = jnp.tanh(c @ w)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=n_mm)
        return c.sum()

    w = jax.device_put(
        np.eye(M, dtype=np.float32) * 0.99 + 0.001
    )
    x0 = jax.device_put(np.ones((M, M), np.float32))
    np.asarray(burn(x0))  # compile + settle

    def med(f, n=reps):
        ts = []
        for k in range(n):
            dt = f(k)
            ts.append(dt)
        return float(np.median(ts))

    def timed(g):
        t0 = time.perf_counter()
        g()
        return time.perf_counter() - t0

    # 1. Round-trip latency: fetch a fresh tiny array (dispatch + trip).
    jtiny = jax.jit(lambda s: s + 1)
    np.asarray(jtiny(jnp.int32(0)))
    lat_s = med(lambda k: timed(lambda: np.asarray(jtiny(jnp.int32(k)))),
                n=max(reps, 20))

    # 2. D2H bandwidth at the serving payload shape (fresh + pre-synced
    # array each rep: only the transfer is on the clock).
    def d2h_rep(k):
        p = fresh_payload(k + 1)
        return timed(lambda: np.asarray(p))
    d2h_s = med(d2h_rep)
    mb = B * chunk / 1e6
    bw_mbps = mb / max(d2h_s - lat_s, 1e-9)

    # 3a. Compute-only wall (sync on the scalar result).
    comp_s = med(lambda k: timed(lambda: np.asarray(burn(x0))))

    # 3b. Serialized: compute to completion, THEN fetch a fresh payload.
    def serial_rep(k):
        p = fresh_payload(1000 + k)
        def g():
            np.asarray(burn(x0))
            np.asarray(p)
        return timed(g)
    serial_s = med(serial_rep)

    # 3c. Pipelined: dispatch compute (async), fetch the unrelated
    # payload while it runs, then sync the compute — the serving pool's
    # pipeline=True ordering exactly.
    def pipe_rep(k):
        p = fresh_payload(2000 + k)
        def g():
            r = burn(x0)      # async dispatch
            np.asarray(p)     # D2H while (ideally) computing
            np.asarray(r)     # sync
        return timed(g)
    pipe_s = med(pipe_rep)

    # overlap = 1 means the fetch fully hid under compute;
    # 0 means the relay serialized them (pipe == serial).
    denom = max(serial_s - max(comp_s, d2h_s), 1e-9)
    overlap = float(np.clip((serial_s - pipe_s) / denom, 0.0, 1.0))

    # Serving implications at this shape (16 kHz):
    audio_per_step = B * chunk / 16000.0
    mega_ceiling = float(os.environ.get("BENCH_CEILING_AS", "1793.0"))
    compute_step = audio_per_step / mega_ceiling
    d2h_eff = (1.0 - overlap) * d2h_s
    model_delivered = audio_per_step / (compute_step + d2h_eff)

    print(json.dumps({
        "metric": "relay_probe",
        "payload_mb": round(mb, 2),
        "latency_ms": round(lat_s * 1e3, 2),
        "d2h_ms": round(d2h_s * 1e3, 1),
        "d2h_mb_per_s": round(bw_mbps, 1),
        "compute_ms": round(comp_s * 1e3, 1),
        "serial_ms": round(serial_s * 1e3, 1),
        "pipelined_ms": round(pipe_s * 1e3, 1),
        "overlap_frac": round(overlap, 3),
        "modeled_delivered_as_per_s": round(model_delivered, 1),
        "unit": "ms / MB/s",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
