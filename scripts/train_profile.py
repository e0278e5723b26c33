"""Capture + summarize an xplane profile of the fused training step.

VERDICT r1 item 2: back the training-throughput bound with a profile, not
prose. Captures jax.profiler traces around fused train steps at the
production shape, then (if the device plane is present — the axon relay
may only expose host-side planes) aggregates per-op self time from the
xplane via tensorboard_plugin_profile.

    python scripts/train_profile.py   # TP_BATCH/TP_WINDOW/TP_STEPS/TP_DIR
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize_xplane(xplane_path: str, top: int = 25) -> dict:
    """Aggregate per-event self-time by plane from a raw .xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xspace.ParseFromString(f.read())
    planes = {}
    for plane in xspace.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0) + ev.duration_ps
        if totals:
            ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
            planes[plane.name] = [
                {"op": k, "ms": round(v / 1e9, 3)} for k, v in ranked
            ]
    return planes


def main() -> int:
    import jax

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _WAVENET30
    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step
    from lb_wavenet_tpu.utils.profiling import train_step_speed_of_light

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("TP_BATCH", "8"))
    window = int(os.environ.get("TP_WINDOW", "6144"))
    steps = int(os.environ.get("TP_STEPS", "6"))
    out_dir = os.environ.get("TP_DIR", "/tmp/wavenet_train_profile")
    fused_frontend = os.environ.get("TP_FUSED_FRONTEND", "1") == "1"
    train = TrainConfig(
        batch_size=batch, window_size=window, fused_stack=True, tapcat=True,
        fused_post=os.environ.get("TP_FUSED_POST", "1") == "1",
        fused_frontend=fused_frontend,
        mm_embed_grad=(
            os.environ.get("TP_MM_EMBED", "1") == "1" and not fused_frontend
        ),
    )
    state = init_state(jax.random.key(0), arch, train)
    r = arch.receptive_field
    b = {
        "inputs": jax.random.randint(
            jax.random.key(1), (batch, r - 1 + window), 0,
            arch.quant_channels,
        ).astype(np.int32),
        "targets": jax.random.randint(
            jax.random.key(2), (batch, window), 0, arch.quant_channels
        ).astype(np.int32),
        "mask": jax.numpy.ones((batch, window), np.float32),
    }
    # Warm (compile) outside the trace.
    state, loss = train_step(state, b, arch, train)
    np.asarray(loss)

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = train_step(state, b, arch, train)
    np.asarray(loss)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    ))
    planes = summarize_xplane(xplanes[-1]) if xplanes else {}
    sol = train_step_speed_of_light(arch, batch, window, tapcat=True)

    # Per-step breakdown from the device plane: the two Pallas kernels are
    # the tpu_custom_calls (transpose_jvp = backward, jvp = forward);
    # everything else in the module time is the XLA tail (frontend, post
    # network + loss fwd/bwd, Adam, weight staging copies).
    breakdown = {}
    dev = next((v for k, v in planes.items() if "TPU" in k), [])
    step_ms = None
    for item in dev:
        ms = item["ms"] / steps
        if item["op"].startswith("jit_"):
            step_ms = ms
        elif "transpose_jvp" in item["op"]:
            # Keep the FIRST (largest — the plane is sorted desc) match:
            # smaller later ops can carry the same jvp naming (this
            # overwrote 8.16 with a 0.57 ms copy at the W=10240 shape).
            breakdown.setdefault("bwd_kernel_ms", round(ms, 2))
        elif item["op"].startswith("%jvp"):
            breakdown.setdefault("fwd_kernel_ms", round(ms, 2))
    if step_ms is not None:
        breakdown["device_step_ms"] = round(step_ms, 2)
        if "bwd_kernel_ms" in breakdown and "fwd_kernel_ms" in breakdown:
            breakdown["xla_tail_ms"] = round(
                step_ms - breakdown["bwd_kernel_ms"]
                - breakdown["fwd_kernel_ms"], 2
            )

    print(json.dumps({
        "metric": "train_profile",
        "step_ms_traced": round(1e3 * wall / steps, 2),
        "samples_per_sec": round(batch * window * steps / wall, 1),
        "sol_step_ms": round(sol["sol_step_ms"], 2),
        "sol_bound": sol["bound"],
        "breakdown": breakdown,
        "xplane": xplanes[-1] if xplanes else None,
        "planes_found": sorted(planes),
        "device_top_ops": [
            {"op": it["op"][:96], "ms_per_step": round(it["ms"] / steps, 3)}
            for it in dev[:20]
        ],
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
