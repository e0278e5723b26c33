"""Benchmark harness: batched AR synthesis throughput on one chip.

Headline metric (BASELINE.json): audio-seconds synthesized per wall-clock
second per chip, batched ring-buffer sampling. North-star target is >= 10x
real time per v5e chip; the reference publishes no numbers (BASELINE.md), so
vs_baseline reports value / 10.0 (ratio against the 10x-real-time target).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env knobs: BENCH_BATCH (default 128), BENCH_SAMPLES (default 2048),
BENCH_CONFIG (arch preset: wavenet30 | stress), BENCH_ENGINE
(xla | pallas | turbo | mega; default mega, turbo when batch % 128 != 0).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import jax

    # Persistent compilation cache: remote TPU compiles over this image's
    # relay can take minutes under load; cached executables load in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params

    preset = os.environ.get("BENCH_CONFIG", "wavenet30")
    if preset == "stress":
        arch = ArchConfig(
            n_blocks=3,
            n_layers_per_block=10,
            residual_channels=64,
            skip_channels=512,
            gate_channels=64,
            sample_rate=24000,
        )
        batch = int(os.environ.get("BENCH_BATCH", "256"))
    elif preset == "mel":
        # BASELINE config 3: mel-conditioned vocoder (flagship).
        arch = ArchConfig(
            n_blocks=3,
            n_layers_per_block=10,
            residual_channels=64,
            skip_channels=256,
            gate_channels=64,
            n_mels=80,
            cond_channels=64,
            upsample_factors=(4, 8, 8),
        )
        batch = int(os.environ.get("BENCH_BATCH", "512"))
    else:
        arch = ArchConfig(
            n_blocks=3,
            n_layers_per_block=10,
            residual_channels=64,
            skip_channels=256,
            gate_channels=64,
        )
        # B=512 is the measured throughput optimum for the mega engine on
        # v5e (428 vs ~330 @ B=256; past 512 it degrades — docs/kernels.md).
        batch = int(os.environ.get("BENCH_BATCH", "512"))
    n_samples = int(os.environ.get("BENCH_SAMPLES", "8192"))
    # Engine: mega (whole loop in one Pallas kernel) is the production
    # default; it requires batch % 128 == 0, else fall back to turbo.
    engine = os.environ.get("BENCH_ENGINE", "")
    if not engine:
        engine = "mega" if batch % 128 == 0 else "turbo"

    params = init_params(jax.random.key(0), arch)
    params = jax.device_put(params)

    import numpy as np

    cond_full = None
    if preset == "mel":
        from lb_wavenet_tpu.models.conditioning import upsample_cond

        frames = jax.random.normal(
            jax.random.key(3),
            (batch, 2 * n_samples // arch.hop_size + 1, arch.n_mels),
        )
        cond_full = upsample_cond(
            params["upsampler"], arch, frames,
            jax.numpy.dtype(arch.compute_dtype),
        )

    def run(n):
        out = generate_classes(
            params,
            arch,
            jax.random.key(1),
            batch,
            n,
            cond=cond_full,
            temperature=1.0,
            engine=engine,
        )
        # NOTE: on the axon remote backend block_until_ready() can return
        # before execution completes; a host materialization is the only
        # reliable sync. Transfer cost (~0.1 s for MBs) is noise vs multi-
        # second timed runs.
        return np.asarray(out)

    # Warmup / compile both lengths (persistent cache makes reruns cheap).
    t0 = time.perf_counter()
    run(n_samples)
    run(2 * n_samples)
    compile_s = time.perf_counter() - t0

    # Difference T vs 2T cancels constant per-call overhead (host fetch over
    # this image's relay, dispatch); best-of-3 guards against relay jitter.
    t_short = t_long = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(n_samples)
        t_short = min(t_short, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out2 = run(2 * n_samples)
        t_long = min(t_long, time.perf_counter() - t0)
    assert out.shape == (batch, n_samples)
    elapsed = max(t_long - t_short, 1e-6)  # time for n_samples of pure loop

    audio_sec = batch * n_samples / arch.sample_rate
    value = audio_sec / elapsed
    print(
        json.dumps(
            {
                "metric": "batched_ar_synthesis_throughput",
                "value": round(value, 3),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(value / 10.0, 3),
                "detail": {
                    "preset": preset,
                    "batch": batch,
                    "n_samples": n_samples,
                    "sample_rate": arch.sample_rate,
                    "steps_per_sec": round(n_samples / elapsed, 1),
                    "compile_s": round(compile_s, 1), "t_short_s": round(t_short, 3), "t_long_s": round(t_long, 3),
                    "engine": engine,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
