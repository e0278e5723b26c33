"""Single-chip FLOOR of the model-sharded (skip-split) synthesis paths.

Real multi-chip TP is unmeasurable on this 1-chip image, but the per-chip
cost of the TP formulation IS measurable: build the SAME shard_map
skip-split program `parallel/synthesis._skip_sharded_generate` builds — the
skip-sliced param layout, the per-step fused kernel, the psum at the post
hidden (size-1 axis here: lowers to a copy), the XLA sampling/frontend —
on a (data=1, model=1) mesh and time it. The multi-chip run adds only the
~10 us (B, S) psum per step from docs/kernels.md's ICI budget.

The jitted fns are built ONCE per (engine, length) — the first version of
this script called mesh_generate_classes per rep, whose per-call closure
rebuild retraces every invocation and drowned the n-vs-2n difference in
trace noise (the "13872 a-s/s" artifact).

Engines: pallas (r3 path: batch-major ar_step kernel + threefry sampling)
vs mega (r4 ar_tp step: feature-major merged contractions + per-lane hash
in XLA). Emits one JSON line per engine; numbers land in BASELINE.md.

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
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _WAVENET30
    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params
    from lb_wavenet_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
    from lb_wavenet_tpu.parallel.synthesis import (
        _place_global,
        skip_sharded_param_specs,
    )

    if os.environ.get("BENCH_CONFIG", "") == "stress":
        # The 512-skip stress config is the TP split's MOTIVATING shape
        # (skip/post width is what outgrows a chip first).
        arch = ArchConfig(
            n_blocks=3, n_layers_per_block=10, residual_channels=64,
            skip_channels=512, gate_channels=64, sample_rate=24000,
        )
    else:
        arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n = int(os.environ.get("BENCH_SAMPLES", "2048"))
    mesh = make_mesh(1, 1)
    params = init_params(jax.random.key(0), arch)
    specs = skip_sharded_param_specs(params)
    placed = jax.tree_util.tree_map(
        lambda x, sp: _place_global(x, mesh, sp), params, specs
    )
    rng = jax.random.key(1)
    key_impl = str(jax.random.key_impl(rng))
    key_data = _place_global(jax.random.key_data(rng), mesh, P())

    for engine in ("mega", "pallas"):
        def build(n_s, engine=engine):
            def per_shard(p, r):
                r = jax.random.wrap_key_data(r, impl=key_impl)
                r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
                return generate_classes(
                    p, arch, r, batch, n_s, engine=engine,
                    temperature=1.0, model_axis=MODEL_AXIS,
                )

            return jax.jit(shard_map(
                per_shard, mesh=mesh,
                in_specs=(specs, P()),
                out_specs=P(DATA_AXIS, None),
                check_vma=False,
            ), out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)))

        fns = {k: build(k) for k in (n, 2 * n)}

        def run(n_s):
            out = fns[n_s](placed, key_data)
            probe = np.asarray(out[:, -1])
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
                "t_short_s": round(t_short, 3),
                "t_long_s": round(t_long, 3),
                "backend": jax.default_backend(),
            },
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
