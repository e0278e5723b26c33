"""Serving-policy benchmark: continuous batching vs wave batching.

Replays one seeded trace of variable-length synthesis requests through
`serving.SessionPool` twice on the real chip:

  * CONTINUOUS — finished lanes are recycled immediately (`reset_lanes`),
    so the batch stays full until the trace drains;
  * WAVE — the classic fixed-batch policy: fill all B lanes, run until the
    LONGEST request of the wave finishes, then load the next wave (no
    mid-flight recycling — what you get without reset_lanes).

Both policies run the identical per-step program (same engine, batch,
chunk), so the step-count ratio isolates the scheduling win; wall-clock is
also reported (absolute numbers on this image are depressed by the
relay D2H of delivered audio, which both policies pay per step).

    python scripts/serving_bench.py     # BENCH_BATCH/BENCH_CHUNK/BENCH_REQS

Emits one JSON line; numbers land in BASELINE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_trace(params, arch, batch, chunk, lengths, policy,
              engine, rng_key, pipeline=False, deliver="chunk") -> dict:
    from lb_wavenet_tpu.serving import SessionPool

    acc = -(-(int(max(lengths)) + 2 * chunk) // chunk) * chunk
    pool = SessionPool(params, arch, batch, rng_key, engine=engine,
                       chunk_size=chunk, temperature=1.0,
                       pipeline=pipeline, deliver=deliver,
                       acc_samples=max(acc, 4 * chunk))
    queue = [(f"r{i}", int(n)) for i, n in enumerate(lengths)]
    next_req = 0
    delivered = 0
    steps = 0

    def fill():
        nonlocal next_req
        while next_req < len(queue):
            rid, n = queue[next_req]
            if not pool.submit(rid, n):
                break
            next_req += 1

    t0 = time.perf_counter()
    fill()
    chunk_lat = []
    # Saturated-window accounting: production pools run with every lane
    # leased; a finite trace ends with a drain tail of partly-idle steps
    # that depresses the whole-trace delivered rate. Steps dispatched with
    # zero free lanes give the steady-state rate. (Pipelined pools deliver
    # one step late — the attribution skew is one chunk and noted as such.)
    sat_steps = 0
    sat_time = 0.0
    sat_audio = 0
    while pool.active or next_req < len(queue):
        saturated = pool.free_lanes() == 0
        ts = time.perf_counter()
        got = 0
        for rid, (classes, done) in pool.step().items():
            got += len(classes)
        dt = time.perf_counter() - ts
        delivered += got
        chunk_lat.append(dt)
        steps += 1
        if saturated:
            sat_steps += 1
            sat_time += dt
            sat_audio += got
        if policy == "continuous":
            fill()
        elif policy == "wave" and not pool.active:
            fill()
        else:
            assert policy in ("continuous", "wave")
    wall = time.perf_counter() - t0
    assert delivered == sum(lengths)
    lat_ms = 1000.0 * np.asarray(chunk_lat)
    # Per-phase split from the pool's built-in cumulative timers
    # (serving.SessionPool.stats): where each step's wall actually goes.
    nst = max(pool.stats["steps"], 1)
    phase_ms = {
        k[:-2]: round(1000.0 * v / nst, 2)
        for k, v in pool.stats.items() if k.endswith("_s")
    }
    return {
        "phase_ms_per_step": phase_ms,
        "saturated_steps": sat_steps,
        "saturated_audio_sec_per_sec": round(
            sat_audio / arch.sample_rate / sat_time, 1
        ) if sat_time > 0 else None,
        "steps": steps,
        "chunk_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
        "chunk_ms_p99": round(float(np.percentile(lat_ms, 99)), 2),
        "wall_s": round(wall, 2),
        "delivered_audio_sec": round(delivered / arch.sample_rate, 1),
        "audio_sec_per_sec": round(
            delivered / arch.sample_rate / wall, 1
        ),
    }


def main() -> int:
    import jax

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _WAVENET30
    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.models.wavenet import init_params

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    chunk = int(os.environ.get("BENCH_CHUNK", "1024"))
    n_reqs = int(os.environ.get("BENCH_REQS", str(4 * batch)))
    engine = os.environ.get("BENCH_ENGINE", "mega")

    params = jax.device_put(init_params(jax.random.key(0), arch))
    # Variable-length trace: 0.25-2 s requests (uniform), seeded.
    # BENCH_REQ_MIN/MAX override the length range (tiny CPU smokes).
    lo = int(os.environ.get("BENCH_REQ_MIN", "4096"))
    hi = int(os.environ.get("BENCH_REQ_MAX", "32768"))
    rng = np.random.default_rng(42)
    lengths = rng.integers(lo, hi + 1, n_reqs)

    # Warm every jitted path (stream_chunk AND reset_lanes) before timing —
    # relay compiles take minutes and whichever policy runs first would
    # otherwise absorb them (this confounded the first measurement: 191 s
    # continuous vs 12 s wave was compile order, not policy cost).
    t0 = time.perf_counter()
    run_trace(
        params, arch, batch, chunk, [chunk] * (batch + 1),
        "continuous", engine, jax.random.key(9),
    )
    compile_s = time.perf_counter() - t0

    results = {}
    for policy in ("continuous", "wave"):
        results[policy] = run_trace(
            params, arch, batch, chunk, lengths, policy,
            engine, jax.random.key(1),
        )
    # Pipelined continuous batching (VERDICT r1 item 10): chunk t+1
    # dispatches while the host delivers chunk t — same device program,
    # bit-identical audio, overlap shows up as lower per-chunk latency/wall.
    results["continuous_pipelined"] = run_trace(
        params, arch, batch, chunk, lengths, "continuous",
        engine, jax.random.key(1), pipeline=True,
    )
    # Device-side per-request accumulation (VERDICT r3 item 6): no per-step
    # D2H at all — each request's audio is fetched once at completion from
    # the device time ring. Output bit-identical (tests/test_serving.py).
    results["continuous_request_mode"] = run_trace(
        params, arch, batch, chunk, lengths, "continuous",
        engine, jax.random.key(1), deliver="request",
    )
    results["continuous_request_mode_pipelined"] = run_trace(
        params, arch, batch, chunk, lengths, "continuous",
        engine, jax.random.key(1), pipeline=True, deliver="request",
    )
    ratio = results["wave"]["steps"] / results["continuous"]["steps"]
    print(json.dumps({
        "metric": "continuous_batching_step_reduction",
        "value": round(ratio, 3),
        "unit": "x fewer fixed-shape steps vs wave batching",
        "vs_baseline": None,
        "detail": {
            "batch": batch, "chunk": chunk, "n_requests": n_reqs,
            "engine": engine, "compile_s": round(compile_s, 1),
            "lengths": f"U({lo}, {hi}) samples seeded",
            "continuous": results["continuous"],
            "continuous_pipelined": results["continuous_pipelined"],
            "continuous_request_mode": results["continuous_request_mode"],
            "continuous_request_mode_pipelined": results[
                "continuous_request_mode_pipelined"
            ],
            "request_mode_delivered_speedup": round(
                results["continuous_request_mode"]["audio_sec_per_sec"]
                / max(results["continuous"]["audio_sec_per_sec"], 1e-9), 3,
            ),
            "pipeline_wall_speedup": round(
                results["continuous"]["wall_s"]
                / max(results["continuous_pipelined"]["wall_s"], 1e-9), 3,
            ),
            "wave": results["wave"],
            "wall_speedup": round(
                results["wave"]["wall_s"]
                / max(results["continuous"]["wall_s"], 1e-9), 3,
            ),
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
