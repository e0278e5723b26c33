"""On-chip A/B: fused frontend kernel (TrainConfig.fused_frontend) vs the
mm_embed_grad XLA frontend, on top of the full round-3 production recipe
(fused_stack + tapcat + fused_post).

One process, both variants compiled up front, alternating timed reps
(relay variance demands paired in-session comparison — CLAUDE.md).

    python scripts/frontend_fuse_ab.py   # AB_BATCH/AB_WINDOW/AB_ACCUM/AB_REPS
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from bench import _WAVENET30
    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("AB_BATCH", "8"))
    window = int(os.environ.get("AB_WINDOW", "6144"))
    accum = int(os.environ.get("AB_ACCUM", "1"))
    reps = int(os.environ.get("AB_REPS", "6"))
    steps = int(os.environ.get("AB_STEPS", "8"))

    r = arch.receptive_field
    x = jax.random.randint(
        jax.random.key(1), (batch, r - 1 + window), 0, arch.quant_channels
    )
    tgt = jax.random.randint(
        jax.random.key(2), (batch, window), 0, arch.quant_channels
    )
    b = {
        "inputs": x.astype(np.int32), "targets": tgt.astype(np.int32),
        "mask": jax.numpy.ones((batch, window), np.float32),
    }

    variants = {}
    for name, mm, ff in (
        ("mm_embed", True, False),       # round-3 production recipe so far
        ("fused_frontend", False, True),
    ):
        tr = TrainConfig(
            batch_size=batch, window_size=window, fused_stack=True,
            tapcat=True, grad_accum=accum, fused_post=True,
            mm_embed_grad=mm, fused_frontend=ff,
        )
        state = init_state(jax.random.key(0), arch, tr)
        variants[name] = [tr, state]

    def run(name, k):
        tr, state = variants[name]
        t0 = time.perf_counter()
        for _ in range(k):
            state, loss = train_step(state, b, arch, tr)
        np.asarray(loss)  # sync (block_until_ready unreliable on axon)
        variants[name][1] = state
        return time.perf_counter() - t0, float(np.asarray(loss))

    compile_t = {}
    for name in variants:
        t0 = time.perf_counter()
        _, loss = run(name, 1)
        compile_t[name] = round(time.perf_counter() - t0, 1)
        print(json.dumps({"compiled": name, "s": compile_t[name],
                          "loss": round(loss, 4)}), flush=True)

    times = {name: [] for name in variants}
    for rep in range(reps):
        for name in variants:
            dt, _ = run(name, steps)
            times[name].append(dt / steps)
            print(json.dumps({
                "rep": rep, "variant": name,
                "ms_per_step": round(1e3 * dt / steps, 2),
            }), flush=True)

    out = {"batch": batch, "window": window, "accum": accum}
    for name in variants:
        ts = sorted(times[name])
        best, med = ts[0], ts[len(ts) // 2]
        out[name] = {
            "best_ms": round(1e3 * best, 2),
            "median_ms": round(1e3 * med, 2),
            "samples_per_sec_best": round(batch * window / best),
        }
    out["speedup"] = round(
        out["mm_embed"]["median_ms"]
        / out["fused_frontend"]["median_ms"], 4
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
