"""Same-session 3-way re-confirm of the serving delivered-throughput
record (VERDICT r4 item 9): the r4 record cell (B=1536, chunk=4096,
pipelined chunk delivery, 4608 mixed-length requests) rested on ONE
session and this relay's numbers carry weather. Three back-to-back runs
of the record cell in ONE process — plus the B=512/chunk=1024 comparison
cell — pin the spread.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import numpy as np  # noqa: E402


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
    from serving_bench import run_trace

    arch = ArchConfig(**_WAVENET30)
    params = jax.device_put(init_params(jax.random.key(0), arch))
    rng = np.random.default_rng(42)

    cells = [
        ("record B=1536/chunk=4096", 1536, 4096, 4608),
        ("compare B=512/chunk=1024", 512, 1024, 2048),
    ]
    reps = int(os.environ.get("CONFIRM_REPS", "3"))
    out = {}
    for label, batch, chunk, n_reqs in cells:
        lengths = rng.integers(4096, 32768 + 1, n_reqs)
        # Warm both jitted paths before timing (compile order confound).
        run_trace(params, arch, batch, chunk, [chunk] * (batch + 1),
                  "continuous", "mega", jax.random.key(9), pipeline=True)
        vals = []
        for rep in range(reps):
            r = run_trace(
                params, arch, batch, chunk, lengths, "continuous",
                "mega", jax.random.key(1), pipeline=True,
            )
            vals.append(r["audio_sec_per_sec"])
            print(json.dumps({"cell": label, "rep": rep, **r}), flush=True)
        out[label] = {
            "runs": vals,
            "best": max(vals),
            "spread_pct": round(
                100.0 * (max(vals) - min(vals)) / max(vals), 1
            ),
        }
    print(json.dumps({"confirm": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
