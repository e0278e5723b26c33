"""Benchmark harness: batched AR synthesis + training throughput on one chip.

Headline metric (BASELINE.json): audio-seconds synthesized per wall-clock
second per chip, batched ring-buffer sampling. North-star target is >= 10x
real time per v5e chip; the reference publishes no numbers (BASELINE.md), so
vs_baseline reports value / 10.0 (ratio against the 10x-real-time target).

Output protocol (VERDICT r3 item 1 — the driver parses the LAST JSON line of
the tail, and round 3's all-or-nothing harness timed out with an empty tail):
the DEFAULT run (no BENCH_* env) prints JSON lines cheapest-compile first,
flushing each immediately, so the tail always carries a parseable number even
if a later, more expensive program dies in compile under relay congestion:

  1. "ar_synthesis_smoke"  — turbo engine, B=256, T=2048: the step kernel
     compiles in seconds (BASELINE.md round-1 row), so this line survives
     almost any relay weather.
  2. "train_throughput"    — the full production recipe at the recorded
     headline shape (B=256/accum=32/W=10240, 5.90M samples/sec/chip in
     round 4); VERDICT r3 item 2: the training headline must be
     driver-visible.
  3. "batched_ar_synthesis_throughput" — the mega B=1536 headline, LAST so
     it wins the driver's `parsed` whenever it completes.

Setting any BENCH_* knob keeps the old single-measurement behavior (one JSON
line) so A/B sweeps stay uncontaminated; BENCH_PRELUDE=0 skips the prelude
lines in the default run.

Env knobs: BENCH_BATCH (preset-specific default), BENCH_SAMPLES (default 8192),
BENCH_CONFIG (arch preset: wavenet30 | stress | mel), BENCH_ENGINE
(xla | pallas | turbo | mega; default mega, turbo when batch % 128 != 0),
BENCH_STREAM_CHUNK (N > 0: drive the STREAMING session path in chunks of N
samples — for the mel preset the conditioning is upsampled per chunk via
StreamingUpsampler, so peak HBM is O(chunk) instead of O(total samples),
unlocking batches the one-shot mel path cannot hold),
BENCH_MODE=train (time ONLY the training step: fused+tapcat+grad_accum
production recipe on the wavenet30 arch; knobs BENCH_BATCH / BENCH_WINDOW /
BENCH_ACCUM / BENCH_STEPS; n-vs-2n difference timing like the synthesis
path).

SAFETY (VERDICT r3 item 3): BENCH_ENGINE=xla with batch >= 512 on the TPU
backend reproducibly CRASHES the TPU worker on this image (BASELINE.md
round-3 XLA row: 3/3 runs died in "TPU worker process crashed or restarted",
~5 min recovery, and the killed client wedges the relay). The harness now
refuses that cell; BENCH_FORCE=1 overrides.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The canonical BASELINE config-2 geometry, shared by the synthesis preset
# and the train line so both headlines measure the SAME model.
_WAVENET30 = dict(
    n_blocks=3, n_layers_per_block=10, residual_channels=64,
    skip_channels=256, gate_channels=64,
)

from lb_wavenet_tpu.utils.hazards import check_xla_engine_batch  # noqa: E402


def _emit(payload: dict) -> None:
    """One JSON line, flushed IMMEDIATELY: if a later program hangs and the
    driver's timeout kills us, buffered lines would be lost with it."""
    print(json.dumps(payload), flush=True)


def main() -> int:
    import jax

    # WAVENET_PLATFORM=cpu forces CPU (for smoke tests); env JAX_PLATFORMS
    # alone does NOT work in this image (axon.register overrides it).
    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # Persistent compilation cache: remote TPU compiles over this image's
    # relay can take minutes under load; cached executables load in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if os.environ.get("BENCH_MODE", "") == "train":
        _train_line()
        return 0

    custom = any(
        os.environ.get(k)
        for k in (
            "BENCH_CONFIG", "BENCH_BATCH", "BENCH_ENGINE", "BENCH_SAMPLES",
            "BENCH_STREAM_CHUNK", "BENCH_PERLANE", "BENCH_GLOBAL_RNG",
        )
    )
    if custom:
        # Explicit single measurement (A/B sweeps): old one-line behavior.
        _synthesis_line()
        return 0

    # Driver default run: cheap lines first, headline LAST (see module doc).
    if os.environ.get("BENCH_PRELUDE", "1") != "0":
        try:
            _synthesis_line(
                metric="ar_synthesis_smoke", preset="wavenet30",
                batch=256, n_samples=2048, engine="turbo",
            )
        except Exception as e:  # pragma: no cover - defensive
            print(f"smoke line failed: {e!r}", file=sys.stderr, flush=True)
        try:
            _train_line()
        except Exception as e:  # pragma: no cover - defensive
            print(f"train line failed: {e!r}", file=sys.stderr, flush=True)
    _synthesis_line()
    return 0


def _synthesis_line(
    metric: str = "batched_ar_synthesis_throughput",
    preset=None, batch=None, n_samples=None, engine=None,
) -> None:
    """Measure one synthesis configuration and print its JSON line.

    Explicit args override the env knobs (the prelude uses them); the
    headline call reads everything from env/defaults as before.
    """
    import jax

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params

    if preset is None:
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
        # Stress: 1032 a-s/s measured at B=1024 (D2H-free timing).
        if batch is None:
            batch = int(os.environ.get("BENCH_BATCH", "1024"))
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
        # Mel: the upsampled conditioning stream is (B, 2T, Cc) in HBM
        # (~4 GB at B=1024/T=16k -> ResourceExhausted on v5e); 512 is the
        # largest clean batch at the default clip length.
        if batch is None:
            batch = int(os.environ.get("BENCH_BATCH", "512"))
    else:
        arch = ArchConfig(**_WAVENET30)
        # B=1536 is the measured throughput optimum for the mega engine on
        # v5e with the D2H-free timing (2475 a-s/s vs 2250 @ B=1024/1280,
        # 1985 @ B=2048 — docs/kernels.md). The old "512 optimum" was a
        # relay-D2H measurement artifact.
        if batch is None:
            batch = int(os.environ.get("BENCH_BATCH", "1536"))
    if n_samples is None:
        n_samples = int(os.environ.get("BENCH_SAMPLES", "8192"))
    stream_chunk_n = int(os.environ.get("BENCH_STREAM_CHUNK", "0"))
    # Engine: mega (whole loop in one Pallas kernel) is the production
    # default; it requires batch % 128 == 0, else fall back to turbo
    # (which streams too — same fallback the CLI performs).
    if engine is None:
        engine = os.environ.get("BENCH_ENGINE", "")
        if not engine:
            engine = "mega" if batch % 128 == 0 else "turbo"
    check_xla_engine_batch(engine, batch)

    params = init_params(jax.random.key(0), arch)
    params = jax.device_put(params)

    import numpy as np

    cond_full = None
    frames = None
    if preset == "mel":
        frames = jax.random.normal(
            jax.random.key(3),
            (batch, 2 * n_samples // arch.hop_size + 8, arch.n_mels),
        )
        if not stream_chunk_n:
            from lb_wavenet_tpu.models.conditioning import upsample_cond

            # One-shot path: the WHOLE upsampled cond stream lives in HBM
            # ((B, 2T, Cc) ~ 4 GB at B=1024/T=16k -> ResourceExhausted);
            # use BENCH_STREAM_CHUNK for larger batches.
            cond_full = upsample_cond(
                params["upsampler"], arch, frames,
                jax.numpy.dtype(arch.compute_dtype),
            )

    def run_streaming(n):
        """Production streaming-session loop (serving.md): chunked emission
        with O(chunk) peak memory; cond upsampled incrementally."""
        from lb_wavenet_tpu.generate import start_stream, stream_chunk

        assert n % stream_chunk_n == 0, "BENCH_SAMPLES % BENCH_STREAM_CHUNK"
        ups = None
        if preset == "mel":
            from lb_wavenet_tpu.models.conditioning import (
                StreamingUpsampler, cond_halo_frames,
            )

            hop = arch.hop_size
            assert stream_chunk_n % hop == 0, "chunk must be frame-aligned"
            fpc = stream_chunk_n // hop
            ups = StreamingUpsampler(
                params["upsampler"], arch,
                dtype=jax.numpy.dtype(arch.compute_dtype),
            )
            # Prime the fixed lookahead so every later feed of fpc frames
            # emits exactly one chunk of cond samples (steady-state buffer
            # width is constant -> one upsampler compile).
            pad = cond_halo_frames(arch)
            primed = ups.feed(frames[:, :pad])
            assert primed.shape[1] == 0
            fed = pad
        stream = start_stream(
            arch, batch, jax.random.key(1), engine=engine, params=params
        )
        # Per-lane counter-hash sampling is the fused engines' DEFAULT now
        # (cost-neutral on-chip, BASELINE.md round-2). BENCH_PERLANE=1
        # passes EXPLICIT lane arrays (the serving-pool path);
        # BENCH_GLOBAL_RNG=1 opts out to the session-global platform chain
        # (the pre-round-3 default) for A/B.
        lane_kw = {}
        if os.environ.get("BENCH_PERLANE", "") == "1":
            lane_kw = dict(
                lane_seed=jax.numpy.arange(batch, dtype=jax.numpy.int32),
                lane_t0=jax.numpy.zeros(batch, jax.numpy.int32),
            )
        if os.environ.get("BENCH_GLOBAL_RNG", "") == "1":
            lane_kw["global_rng"] = True
        total = jax.numpy.zeros((), jax.numpy.int64)
        last = None
        for i in range(n // stream_chunk_n):
            cond_c = None
            if ups is not None:
                cond_c = ups.feed(frames[:, fed : fed + fpc])
                fed += fpc
                assert cond_c.shape[1] == stream_chunk_n
            classes, stream = stream_chunk(
                params, arch, stream, stream_chunk_n, cond=cond_c,
                temperature=1.0, engine=engine, **lane_kw,
            )
            total = total + classes.astype(jax.numpy.int64).sum()
            last = classes
        probe = np.asarray(last[:, -1])
        tot = int(np.asarray(total))  # scalar D2H: the only sync point
        assert probe.shape == (batch,)
        assert 0 <= probe.min() and probe.max() < arch.quant_channels
        return (batch, n), tot

    def run(n):
        if stream_chunk_n:
            return run_streaming(n)
        out = generate_classes(
            params,
            arch,
            jax.random.key(1),
            batch,
            n,
            cond=cond_full,
            temperature=1.0,
            engine=engine,
            global_rng=os.environ.get("BENCH_GLOBAL_RNG", "") == "1",
        )
        # NOTE: on the axon remote backend block_until_ready() can return
        # before execution completes; a host materialization is the only
        # reliable sync. Materialize a REDUCTION, not the full (B, T) class
        # array: the sum depends on every sample (full compute forced) but
        # transfers 8 bytes, while the full array is 16-32 MB whose
        # relay-D2H time scales with T and therefore SURVIVES the
        # difference timing below — it was depressing the measured
        # throughput by ~2.5x (427 vs ~1100 audio-sec/sec measured when
        # only a scalar is fetched).
        probe = np.asarray(out[:, -1])  # (B,) last step: shape/range check
        total = int(np.asarray(out.astype(np.int64).sum()))
        assert probe.shape == (batch,) and 0 <= probe.min() and probe.max() < arch.quant_channels
        return out.shape, total

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
        shape, _ = run(n_samples)
        t_short = min(t_short, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(2 * n_samples)
        t_long = min(t_long, time.perf_counter() - t0)
    assert shape == (batch, n_samples)
    elapsed = max(t_long - t_short, 1e-6)  # time for n_samples of pure loop

    audio_sec = batch * n_samples / arch.sample_rate
    value = audio_sec / elapsed
    _emit(
        {
            "metric": metric,
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
                "stream_chunk": stream_chunk_n or None,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            },
        }
    )


def _train_line() -> None:
    """Training-throughput line: the production recipe (fused Pallas stack +
    tapcat + fused post/frontend kernel pairs + exact gradient accumulation).
    Default shape is the RECORDED round-4 headline cell B=256/accum=32/
    W=10240 (micro-batch 8 at the long-window VMEM edge — the r4 sweep
    found throughput rises with W up to the 121M scoped-VMEM envelope:
    5.90M samples/sec/chip, BASELINE.md round 4) so the driver tail
    carries the flagship training number (VERDICT r3 item 2). BENCH_SP=1
    defaults to its own safe cell (B=8/accum=4/W=4096 — the SP
    formulation's per-shard t_dim envelope is tighter than the windowed
    step's). One JSON line, same schema; constant per-call relay
    overhead cancelled by n-vs-2n difference timing."""
    import jax
    import numpy as np

    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step

    preset = os.environ.get("BENCH_CONFIG", "wavenet30")
    if preset != "wavenet30" or os.environ.get("BENCH_ENGINE"):
        raise SystemExit(
            "BENCH_MODE=train supports only the wavenet30 arch (see "
            "scripts/train_bench.py for TB_MEL/TB_SKIP variants) and takes "
            "no BENCH_ENGINE"
        )
    arch = ArchConfig(**_WAVENET30)
    # BENCH_SP=1: the sequence-parallel train step (production recipe —
    # fused kernel with in-kernel halo mask + tapcat + grad_accum, and
    # since r3 the fused post+CE and frontend kernels too) on a
    # single-chip mesh: measures the SP formulation's per-chip cost vs the
    # windowed step (the multi-chip halo ppermute adds only the R-1-sample
    # neighbor exchange on top). SP keeps its own default window: the SP
    # formulation's per-shard t_dim envelope is tighter (W=6144 at n=1
    # needs 124.38M scoped VMEM > the 121M cap — BASELINE.md round 4), so
    # the windowed default W=10240 would OOM it.
    sp = os.environ.get("BENCH_SP", "") == "1"
    batch = int(os.environ.get("BENCH_BATCH", "8" if sp else "256"))
    window = int(os.environ.get("BENCH_WINDOW", "4096" if sp else "10240"))
    accum = int(os.environ.get("BENCH_ACCUM", "4" if sp else "32"))
    n_steps = int(os.environ.get("BENCH_STEPS", "4"))
    if n_steps <= 0:
        raise SystemExit(f"BENCH_STEPS must be positive, got {n_steps}")
    # BENCH_FUSED_POST=0 / BENCH_MM_EMBED=0 / BENCH_FUSED_FRONTEND=0
    # revert the round-3 tail kernels to the XLA paths for A/B.
    fused_post = os.environ.get("BENCH_FUSED_POST", "1") == "1"
    fused_frontend = (
        os.environ.get("BENCH_FUSED_FRONTEND", "1") == "1"
    )
    train = TrainConfig(
        batch_size=batch, window_size=window, fused_stack=True, tapcat=True,
        grad_accum=accum, seq_parallel=sp, fused_post=fused_post,
        fused_frontend=fused_frontend,
        mm_embed_grad=(
            os.environ.get("BENCH_MM_EMBED", "1") == "1"
            and not fused_frontend
        ),
    )
    state = init_state(jax.random.key(0), arch, train)
    r = arch.receptive_field
    x = jax.random.randint(
        jax.random.key(1), (batch, r - 1 + window), 0, arch.quant_channels
    ).astype(np.int32)
    tgt = jax.random.randint(
        jax.random.key(2), (batch, window), 0, arch.quant_channels
    ).astype(np.int32)
    if sp:
        from lb_wavenet_tpu.data import Batch
        from lb_wavenet_tpu.parallel.mesh import make_mesh
        from lb_wavenet_tpu.train import make_sp_train_step, seq_batch_to_device

        mesh = make_mesh(1, 1)
        sp_step = make_sp_train_step(mesh, arch, train)
        b = seq_batch_to_device(
            Batch(
                inputs=np.asarray(x), targets=np.asarray(tgt),
                mask=np.ones((batch, window), np.float32),
            ),
            mesh, window,
        )
    else:
        b = {
            "inputs": x, "targets": tgt,
            "mask": jax.numpy.ones((batch, window), np.float32),
        }

    def run(k):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(k):
            if sp:
                state, loss = sp_step(state, b)
            else:
                state, loss = train_step(state, b, arch, train)
        np.asarray(loss)  # scalar sync (block_until_ready unreliable on axon)
        return time.perf_counter() - t0, loss

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    # n vs 2n cancels the constant per-call dispatch + relay-fetch overhead
    # (same methodology as the synthesis path).
    t_short = t_long = float("inf")
    for _ in range(3):
        dt, loss = run(n_steps)
        t_short = min(t_short, dt)
        dt, loss = run(2 * n_steps)
        t_long = min(t_long, dt)
    best = max(t_long - t_short, 1e-9) / n_steps
    value = batch * window / best
    default_shape = (batch, window, accum) == (256, 10240, 32) and not sp
    _emit({
        "metric": "sp_train_throughput" if sp else "train_throughput",
        "value": round(value, 1),
        "unit": "samples/sec/chip",
        # vs_baseline: ratio over the round-1 1.78M XLA-path step — reported
        # only at the recorded headline shape, null otherwise, since the
        # baseline was measured at one shape and would conflate shape
        # effects.
        "vs_baseline": (
            round(value / 1_780_000.0, 3) if default_shape else None
        ),
        "detail": {
            "batch": batch, "window": window, "grad_accum": accum,
            "step_ms": round(best * 1e3, 2), "compile_s": round(compile_s, 1),
            "loss": round(float(np.asarray(loss)), 4),
            "backend": jax.default_backend(),
        },
    })


if __name__ == "__main__":
    sys.exit(main())
