"""Profiling & roofline harness (SURVEY.md §5 "Tracing / profiling").

Reference: none beyond optional TensorBoard timelines. Build: wall-clock
timing with reliable synchronization (host materialization — on the axon
remote backend `block_until_ready` can return early), `jax.profiler` trace
capture, and a speed-of-light model for the AR sample step so measured
throughput can be judged against hardware limits.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

# TPU v5e (per chip). Sources: public spec sheets; bf16 MXU peak and HBM BW.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def sync_time(fn: Callable[[], object], reps: int = 3) -> float:
    """Best-of-reps wall time of fn() with host-side materialization."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax_leaves_concrete(out))  # force full execution
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaves_concrete(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0] if leaves else 0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def ar_step_speed_of_light(arch, batch: int, dtype_bytes: int = 2) -> dict:
    """Per-sample-step roofline for the fused AR stack kernel.

    Compute: 2 dilated taps (C->2G), residual (G->C), skip (G->S) per layer,
    plus the post network, at bf16 MXU peak. Memory: ring-buffer tap
    read + write per layer (fp32 in HBM); weights are VMEM-resident.
    """
    L = len(arch.dilations)
    c = arch.residual_channels
    g = arch.gate_channels
    s = arch.skip_channels
    q = arch.quant_channels
    flops = 2 * batch * (
        L * (2 * c * 2 * g + g * c + g * s) + s * s + s * q + q * c + 2 * c * c
    )
    hbm_bytes = 2 * L * batch * c * 4  # tap read + write, fp32
    t_compute = flops / V5E_BF16_FLOPS
    t_memory = hbm_bytes / V5E_HBM_BYTES_PER_S
    return {
        "flops_per_step": flops,
        "hbm_bytes_per_step": hbm_bytes,
        "t_compute_us": t_compute * 1e6,
        "t_memory_us": t_memory * 1e6,
        "sol_step_us": max(t_compute, t_memory) * 1e6,
        "sol_steps_per_sec": 1.0 / max(t_compute, t_memory),
        "sol_audio_sec_per_sec": batch / (arch.sample_rate * max(t_compute, t_memory)),
    }
