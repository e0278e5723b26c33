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
# VPU (vector unit) throughput, fp32 ops/s — approximate (public specs give
# MXU numbers only; the VPU is ~1-2 % of MXU FLOPs on this generation).
# Transcendentals (tanh/sigmoid/exp) cost several VPU ops each.
V5E_VPU_OPS_PER_S = 2.5e12
VPU_OPS_PER_TRANSCENDENTAL = 8.0


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


def _mxu_time(m: int, k: int, n: int, count: float = 1.0) -> tuple:
    """(seconds, flops) for `count` (m,k,n) matmuls at FILL-ADJUSTED MXU peak.

    The 128x128 systolic array delivers peak only when the contraction
    depth K and the output width N fill it; a K=64 contraction runs at half
    peak regardless of M. M only needs to cover the 8-row pipeline, which
    training-shape T (thousands) always does.
    """
    flops = 2.0 * m * k * n * count
    fill = min(k, 128) / 128.0 * min(n, 128) / 128.0
    return flops / (V5E_BF16_FLOPS * fill), flops


def train_step_speed_of_light(
    arch,
    batch: int,
    window: int,
    tapcat: bool = True,
    z_bytes: int = 2,
) -> dict:
    """Speed-of-light model of the FUSED training step (train_stack.py),
    fwd + custom-VJP bwd, per optimizer step of `batch` x `window` samples.

    Three resources, the slowest of which bounds the step:
      * MXU: every matmul of the fused kernels + frontend/post/loss,
        fill-adjusted (K=C=64 contractions run at half the array's depth
        — the structural ceiling for narrow-channel WaveNets).
      * HBM: z_all (the one O(L*T*G) tensor) written fwd + read bwd, the
        (T,C)/(T,S) row tensors, per-(row,layer) weight block refetches,
        and the optimizer's 3x params read + write.
      * VPU: gate transcendentals fwd + recompute bwd (the serial 30-layer
        chain also gives a latency floor not modeled here; see
        docs/kernels.md).

    This is a MODEL (v5e constants above, no overlap assumed between the
    three resources within the grid pipeline — Pallas overlaps DMA with
    compute, so the true bound is max(), which is what we report).
    """
    L = len(arch.dilations)
    c = arch.residual_channels
    g = arch.gate_channels
    s = arch.skip_channels
    q = arch.quant_channels
    cc = arch.cond_channels if arch.use_local_cond else 0
    t = arch.receptive_field - 1 + window  # kernel time extent
    bt = batch * t

    mxu_t, mxu_f = 0.0, 0.0

    def add(m, k, n, count=1.0):
        nonlocal mxu_t, mxu_f
        dt_, f_ = _mxu_time(m, k, n, count)
        mxu_t += dt_
        mxu_f += f_

    # Forward kernel, per layer (grid (B, L), each a (t, .) matmul):
    if tapcat:
        add(t, 2 * c, 2 * g, batch * L)       # merged taps
    else:
        add(t, c, 2 * g, 2 * batch * L)       # w_cur + w_prev
    add(t, g, c, batch * L)                   # residual
    add(t, g, s, batch * L)                   # skip
    if cc:
        add(t, cc, 2 * g, batch * L)          # conditioning
    # Backward kernel, per layer:
    add(t, g, c, batch * L)                   # x reconstruction
    if tapcat:
        add(t, 2 * c, 2 * g, batch * L)       # pre recompute
        add(2 * c, t, 2 * g, batch * L)       # merged tap weight grad
    else:
        add(t, c, 2 * g, 2 * batch * L)
        add(c, t, 2 * g, 2 * batch * L)
    add(t, s, g, batch * L)                   # dz from skip
    add(t, c, g, batch * L)                   # dz from residual
    add(t, 2 * g, c, 2 * batch * L)           # dx tap adjoints
    add(g, t, c, batch * L)                   # dwr
    add(g, t, s, batch * L)                   # dws
    if cc:
        add(t, cc, 2 * g, batch * L)          # cond in recompute
        add(cc, t, 2 * g, batch * L)          # dwcond
        add(t, 2 * g, cc, batch * L)          # dcond
    # Frontend (embed lookup free) + post network + their grads (~2x fwd).
    add(t, c, c, 2 * batch * 3)               # input conv taps, fwd+bwd
    add(t, s, s, batch * 3)
    add(t, s, q, batch * 3)

    # VPU: gate nonlinearities fwd + bwd recompute + dpre algebra.
    trans = 2 * 2 * g * bt * L                # tanh+sigmoid, fwd and bwd
    vpu_ops = trans * VPU_OPS_PER_TRANSCENDENTAL + 10.0 * g * bt * L
    t_vpu = vpu_ops / V5E_VPU_OPS_PER_S

    # HBM per step.
    n_params = (
        L * (2 * c * 2 * g + 2 * g + g * c + c + g * s + s + cc * 2 * g)
        + q * c + 2 * c * c + c + s * s + s + s * q + q
    )
    layer_w_bytes = (2 * c * 2 * g + g * c + g * s + cc * 2 * g) * 4
    hbm = 0.0
    hbm += bt * L * g * z_bytes * 2           # z_all write fwd + read bwd
    hbm += bt * (c * 4 * 4 + s * 4 * 3)       # h0/xfin/dh0 + skip/gskip rows
    if cc:
        hbm += bt * cc * 4 * 3                # cond read x2 + dcond write
    hbm += batch * L * layer_w_bytes * 3      # per-(row,layer) weight blocks
    hbm += n_params * 4 * (2 + 3 * 2)         # grads + Adam m/v/params r+w
    t_hbm = hbm / V5E_HBM_BYTES_PER_S

    bound = max(mxu_t, t_hbm, t_vpu)
    samples = batch * window
    return {
        "mxu_flops_per_step": mxu_f,
        "t_mxu_ms": mxu_t * 1e3,
        "t_hbm_ms": t_hbm * 1e3,
        "t_vpu_ms": t_vpu * 1e3,
        "hbm_bytes_per_step": hbm,
        "bound": ("mxu" if bound == mxu_t else
                  "hbm" if bound == t_hbm else "vpu"),
        "sol_step_ms": bound * 1e3,
        "sol_samples_per_sec": samples / bound,
        "mfu_at_sol": mxu_f / bound / V5E_BF16_FLOPS,
    }
