"""Single-chip FLOOR of the model-sharded (skip-split) synthesis paths.

Real multi-chip TP is unmeasurable on this 1-chip image, but the per-chip
cost of the TP formulation IS measurable: run the shard_map skip-split path
on a (data=1, model=1) mesh — identical program structure (per-step fused
kernel + psum (size-1) + XLA post/sample/frontend), no ICI. The psum over a
1-sized axis lowers to a no-op copy, so the number is the path's per-chip
step-rate class; the multi-chip run adds only the ~10 us (B, S) psum per
step from docs/kernels.md's ICI budget.

Engines: pallas (r3 path: batch-major ar_step kernel + threefry sampling)
vs mega/turbo (r4 ar_tp step: feature-major merged contractions + per-lane
hash in XLA). Emits one JSON line per engine; numbers land in BASELINE.md.

    python scripts/tp_floor_bench.py   # BENCH_BATCH / BENCH_SAMPLES
"""
import json
import os
import sys
import time

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
    from lb_wavenet_tpu.parallel.mesh import make_mesh
    from lb_wavenet_tpu.parallel.synthesis import (
        model_sharded_generate_classes,
    )

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n = int(os.environ.get("BENCH_SAMPLES", "2048"))
    mesh = make_mesh(1, 1)
    params = jax.device_put(init_params(jax.random.key(0), arch))

    for engine in ("mega", "pallas"):
        def run(n_s):
            out = model_sharded_generate_classes(
                params, arch, jax.random.key(1), batch, n_s, mesh,
                engine=engine, temperature=1.0,
            )
            probe = np.asarray(out[:, -1])        # scalar-ish sync
            total = int(np.asarray(out.astype(np.int32).sum()))
            assert probe.shape == (batch,)
            assert 0 <= probe.min() and probe.max() < arch.quant_channels
            return total

        t0 = time.perf_counter()
        run(n)
        run(2 * n)
        compile_s = time.perf_counter() - t0
        t_short = t_long = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(n)
            t_short = min(t_short, time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(2 * n)
            t_long = min(t_long, time.perf_counter() - t0)
        elapsed = max(t_long - t_short, 1e-6)
        value = batch * n / arch.sample_rate / elapsed
        print(json.dumps({
            "metric": f"tp_synthesis_floor_{engine}",
            "value": round(value, 1),
            "unit": "audio-sec/sec/chip (mesh 1x1 floor)",
            "vs_baseline": None,
            "detail": {
                "engine": engine, "batch": batch, "n_samples": n,
                "steps_per_sec": round(n / elapsed, 1),
                "us_per_step": round(1e6 * elapsed / n, 2),
                "compile_s": round(compile_s, 1),
                "backend": jax.default_backend(),
            },
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
