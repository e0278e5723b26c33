"""Training-step throughput on the real chip (BASELINE.md "training
throughput" metric; SURVEY.md §6).

One process per invocation (cross-process numbers vary with relay load);
prints one JSON line per timed config.

Env: TB_FUSED=0|1, TB_BATCH, TB_WINDOW, TB_STEPS (timed steps, default 20),
TB_POST/TB_FRONTEND (fused post+CE / fused frontend kernels, default =
TB_FUSED), TB_TAPCAT, TB_ACCUM, TB_MEL, TB_SKIP.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step

    fused = os.environ.get("TB_FUSED", "0") == "1"
    tapcat = os.environ.get("TB_TAPCAT", "0") == "1"
    f_post = os.environ.get("TB_POST", "1" if fused else "0") == "1"
    f_front = os.environ.get("TB_FRONTEND", "1" if fused else "0") == "1"
    accum = int(os.environ.get("TB_ACCUM", "1"))
    batch = int(os.environ.get("TB_BATCH", "8"))
    window = int(os.environ.get("TB_WINDOW", "4096"))
    n_steps = int(os.environ.get("TB_STEPS", "20"))
    with_mel = os.environ.get("TB_MEL", "0") == "1"

    arch = ArchConfig(
        n_blocks=3, n_layers_per_block=10, residual_channels=64,
        skip_channels=int(os.environ.get("TB_SKIP", "256")),
        gate_channels=64,
        **(
            dict(n_mels=80, cond_channels=64, upsample_factors=(4, 8, 8))
            if with_mel else {}
        ),
    )
    train = TrainConfig(
        batch_size=batch, window_size=window, fused_stack=fused,
        tapcat=tapcat, grad_accum=accum, fused_post=f_post,
        fused_frontend=f_front,
    )
    rng = jax.random.key(0)
    state = init_state(rng, arch, train)

    r = arch.receptive_field
    x = jax.random.randint(
        jax.random.key(1), (batch, r - 1 + window), 0, arch.quant_channels
    ).astype(np.int32)
    tgt = jax.random.randint(
        jax.random.key(2), (batch, window), 0, arch.quant_channels
    ).astype(np.int32)
    mask = jax.numpy.ones((batch, window), np.float32)
    batch_d = {"inputs": x, "targets": tgt, "mask": mask}
    if with_mel:
        n_frames = -(-(r - 1 + window) // arch.hop_size)
        batch_d["mel"] = jax.random.normal(
            jax.random.key(3), (batch, n_frames, arch.n_mels)
        )

    t0 = time.perf_counter()
    state, loss = train_step(state, batch_d, arch, train)
    np.asarray(loss)  # sync (block_until_ready unreliable on axon)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = train_step(state, batch_d, arch, train)
    loss = float(np.asarray(loss))
    elapsed = time.perf_counter() - t0
    step_ms = elapsed / n_steps * 1e3
    sps = batch * window / (elapsed / n_steps)
    print(json.dumps({
        "metric": "train_throughput",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "detail": {
            "fused_stack": fused, "tapcat": tapcat, "grad_accum": accum,
            "fused_post": f_post, "fused_frontend": f_front,
            "batch": batch, "window": window,
            "mel": with_mel,
            "step_ms": round(step_ms, 2), "compile_s": round(compile_s, 1),
            "loss": round(loss, 4), "n_steps": n_steps,
            "backend": jax.default_backend(),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
