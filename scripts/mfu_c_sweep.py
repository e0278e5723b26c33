"""MFU-wall falsification (VERDICT r4 weak #1 / item 3): C=128 A/B.

The r2-r4 profile chain attributes the fused training step's ~59%-of-
fill-adjusted-MXU-bound gap to the serial 30-layer chain + C=64 half-fill
contractions ("structural, not scheduling slack") — an inference never
tested out-of-family. This script runs the SAME fused train step on
wavenet30 (C=G=64) and a C=G=128 variant at one geometry in ONE process:

  * the FILL model predicts the wide arch roughly doubles raw MXU
    efficiency (every contraction reaches the 128-deep systolic array);
  * the SERIAL-CHAIN model predicts the %-of-fill-adjusted-bound stays
    ~constant (the chain cost scales with the compute it serializes).

Whichever way it lands, docs/kernels.md's scoreboard gains its first
out-of-family data point. Difference timing (n vs 2n), scalar-reduction
sync, one process (CLAUDE.md relay rules).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402

if os.environ.get("WAVENET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["WAVENET_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from lb_wavenet_tpu.config import ArchConfig, TrainConfig  # noqa: E402
from lb_wavenet_tpu.train import init_state, train_step  # noqa: E402
from lb_wavenet_tpu.utils.profiling import (  # noqa: E402
    V5E_BF16_FLOPS, train_step_speed_of_light,
)

BATCH = int(os.environ.get("SWEEP_BATCH", "8"))
WINDOW = int(os.environ.get("SWEEP_WINDOW", "4096"))
STEPS = int(os.environ.get("SWEEP_STEPS", "6"))


def measure(arch: ArchConfig, label: str, tapcat: bool = True) -> dict:
    train = TrainConfig(
        batch_size=BATCH, window_size=WINDOW, fused_stack=True,
        tapcat=tapcat, fused_post=True, fused_frontend=True,
    )
    state = init_state(jax.random.key(0), arch, train)
    r = arch.receptive_field
    x = jax.random.randint(
        jax.random.key(1), (BATCH, r - 1 + WINDOW), 0, arch.quant_channels
    ).astype(np.int32)
    tgt = jax.random.randint(
        jax.random.key(2), (BATCH, WINDOW), 0, arch.quant_channels
    ).astype(np.int32)
    b = {"inputs": x, "targets": tgt,
         "mask": jax.numpy.ones((BATCH, WINDOW), np.float32)}

    def run(k):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(k):
            state, loss = train_step(state, b, arch, train)
        np.asarray(loss)  # scalar sync (block_until_ready unreliable)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    t_short = t_long = float("inf")
    for _ in range(3):
        t_short = min(t_short, run(STEPS))
        t_long = min(t_long, run(2 * STEPS))
    step_s = max(t_long - t_short, 1e-9) / STEPS

    sol = train_step_speed_of_light(arch, BATCH, WINDOW, tapcat=tapcat)
    measured_tflops = sol["mxu_flops_per_step"] / step_s / 1e12
    rec = {
        "label": label, "tapcat": tapcat,
        "C": arch.residual_channels, "G": arch.gate_channels,
        "S": arch.skip_channels,
        "batch": BATCH, "window": WINDOW,
        "step_ms": round(step_s * 1e3, 3),
        "samples_per_sec": round(BATCH * WINDOW / step_s, 1),
        "compile_s": round(compile_s, 1),
        "mxu_flops_per_step": sol["mxu_flops_per_step"],
        "sol_step_ms": round(sol["sol_step_ms"], 3),
        "sol_bound": sol["bound"],
        "t_mxu_ms": round(sol["t_mxu_ms"], 3),
        "pct_of_fill_adjusted_bound": round(
            100.0 * sol["sol_step_ms"] / (step_s * 1e3), 1
        ),
        "measured_tflops": round(measured_tflops, 2),
        "pct_of_raw_bf16_peak": round(
            100.0 * measured_tflops * 1e12 / V5E_BF16_FLOPS, 2
        ),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    narrow = ArchConfig(
        n_blocks=3, n_layers_per_block=10, residual_channels=64,
        skip_channels=256, gate_channels=64, compute_dtype="bfloat16",
    )
    # MEASURED LIMITATION (kept for the scoreboard): C=128 does NOT
    # compile — the C-wide tap staging buffer's dynamic-offset access
    # (stage_s[pl.ds(max_d - d, ...)], offsets 511/510/508/... for small
    # d) fails Mosaic's "index multiple of 8" proof once the lane extent
    # exceeds one 128-lane tile (tapcat store AND non-tapcat load alike).
    # The fill hypothesis is tested with G=128 instead: with tapcat the
    # taps already contract at K=2C=128, so raising G to 128 makes EVERY
    # matmul >= 128 deep while the C-dependent staging geometry stays
    # exactly as in production.
    wide = ArchConfig(
        n_blocks=3, n_layers_per_block=10, residual_channels=64,
        skip_channels=256, gate_channels=128, compute_dtype="bfloat16",
    )
    a = measure(narrow, "wavenet30 C=64/G=64 (production, tapcat)")
    b = measure(wide, "full-fill C=64/G=128 (tapcat)")
    print(json.dumps({
        "verdict_inputs": {
            "raw_peak_pct_ratio_wide_over_narrow": round(
                b["pct_of_raw_bf16_peak"] / a["pct_of_raw_bf16_peak"], 3
            ),
            "fill_adjusted_pct": {
                "narrow": a["pct_of_fill_adjusted_bound"],
                "wide": b["pct_of_fill_adjusted_bound"],
            },
        }
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
