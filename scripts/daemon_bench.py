"""Online-daemon throughput: the full HTTP + PoolServer path, one chip.

Measures what a CLIENT of `wavenet serve --listen` sees: N concurrent
HTTP requests (variable lengths, mixed temperatures, pinned seeds)
against an in-process daemon over a mega pool — so the number includes
HTTP parsing, the worker-thread handoff, per-request Event latency, wav
encode, and the loopback socket, on top of the pool's device step.

    python scripts/daemon_bench.py    # BENCH_BATCH/BENCH_CHUNK/BENCH_REQS
    WAVENET_PLATFORM=cpu BENCH_BATCH=4 BENCH_CHUNK=64 BENCH_REQS=8 \
        BENCH_REQ_MIN=64 BENCH_REQ_MAX=256 python scripts/daemon_bench.py

Emits one JSON line; numbers land in BASELINE.md.
"""
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from lb_wavenet_tpu.server import PoolServer, make_http_server
    from lb_wavenet_tpu.serving import SessionPool

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    chunk = int(os.environ.get("BENCH_CHUNK", "1024"))
    n_reqs = int(os.environ.get("BENCH_REQS", str(4 * batch)))
    lo = int(os.environ.get("BENCH_REQ_MIN", "4096"))
    hi = int(os.environ.get("BENCH_REQ_MAX", "16384"))
    engine = os.environ.get("BENCH_ENGINE", "mega")
    # Concurrency = 2x the pool so submits always queue behind a full
    # pool (saturated continuous batching), without thousands of threads.
    workers = int(os.environ.get("BENCH_WORKERS", str(2 * batch)))

    params = jax.device_put(init_params(jax.random.key(0), arch))
    pool = SessionPool(params, arch, batch, jax.random.key(0),
                       engine=engine, chunk_size=chunk, temperature=1.0,
                       pipeline=True)
    ps = PoolServer(pool)
    ps.start()
    httpd = make_http_server(ps, arch, port=0, request_timeout=600.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    host, port = httpd.server_address
    url = f"http://{host}:{port}/synthesize"

    rng = np.random.default_rng(42)
    lengths = rng.integers(lo, hi + 1, n_reqs)
    taus = rng.choice([1.0, 0.8, 0.0], n_reqs)

    # Warm the step/reset compiles with one tiny request.
    req = urllib.request.Request(url, data=json.dumps(
        {"n_samples": chunk, "seed": 1, "format": "classes"}).encode())
    t0 = time.perf_counter()
    urllib.request.urlopen(req, timeout=600).read()
    compile_s = time.perf_counter() - t0

    got_samples = [0] * n_reqs
    errors = []
    idx_lock = threading.Lock()
    next_idx = [0]

    def client():
        while True:
            with idx_lock:
                i = next_idx[0]
                if i >= n_reqs:
                    return
                next_idx[0] += 1
            body = {"n_samples": int(lengths[i]), "seed": int(1000 + i)}
            if taus[i] != 1.0:
                body["temperature"] = float(taus[i])
            r = urllib.request.Request(url, data=json.dumps(body).encode())
            try:
                with urllib.request.urlopen(r, timeout=600) as resp:
                    data = resp.read()
                got_samples[i] = (len(data) - 44) // 2  # wav PCM16
            except Exception as e:  # noqa: BLE001
                errors.append(str(e))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    assert not errors, errors[:3]
    assert got_samples == [int(n) for n in lengths]
    audio = float(sum(lengths)) / arch.sample_rate
    print(json.dumps({
        "metric": "http_daemon_delivered_throughput",
        "value": round(audio / wall, 1),
        "unit": "audio-sec/sec (wav over HTTP, loopback)",
        "vs_baseline": round(audio / wall / 10.0, 1),
        "detail": {
            "batch": batch, "chunk": chunk, "engine": engine,
            "n_requests": n_reqs, "workers": workers,
            "lengths": f"U({lo},{hi})", "wall_s": round(wall, 2),
            "audio_sec": round(audio, 1), "compile_s": round(compile_s, 1),
            "phase_ms_per_step": ps.healthz()["phase_ms_per_step"],
            "steps": pool.stats["steps"],
            "backend": jax.default_backend(),
        },
    }), flush=True)
    httpd.shutdown()
    httpd.server_close()
    ps.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
