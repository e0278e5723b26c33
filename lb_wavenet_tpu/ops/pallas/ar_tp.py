"""TP AR step kernel: mega-class per-step math ending at the LOCAL skip.

This is the "shard_map-mega" design of docs/kernels.md ("Model-sharded
synthesis": kernel ends at the skip accumulator, ONE psum + post in XLA).
When a model outgrows one chip via its skip/post width, the sample loop
cannot stay inside one pallas_call (the per-step psum that completes the
post hidden is an XLA collective), so the mega formulation degenerates to a
per-step kernel — but it KEEPS mega's speed levers, which the round-1
`pallas` TP path (ar_step.py) lacks:

  * FEATURE-MAJOR layout: activations are (channels, batch) so every matmul
    is (M, K) @ (K, B) with the batch as MXU lanes — the merged tap
    contraction runs at K = 2C = 128 full fill where the batch-major
    ar_step kernel contracts at K = C = 64 half fill.
  * Merged current+dilated tap: one (2G, 2C) @ (2C, B) matmul per layer.
  * Merged res+skip output: one (C + S_local, G) @ (G, B) matmul per layer
    (the skip part sliced to this shard's S_local columns — the skip sum
    is column-separable, so slicing it needs NO per-layer collective).
  * Sampling by the stateless per-lane counter hash in XLA (identical bit
    stream to the in-kernel turbo/mega samplers) instead of the pallas
    engine's per-step threefry split+categorical.

The accumulation-order contract therefore matches the MEGA engine (tap
concat + res+skip merge round fewer times than the split xla/pallas form —
ar_mega.py precision note), so greedy TP output tracks single-device mega,
and the sampled stream consumes the SAME per-lane noise as turbo/mega.
Bit-match tests pin class equality vs the single-device mega run on the
CPU mesh (tests/test_distributed_synthesis.py).

Reference parity: the reference (SURVEY.md §2.3) is single-device and has
no TP at all; this path exists for the BASELINE.json north-star "shards the
model across chips via GSPMD only if it exceeds one chip".
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ArchConfig


def _tp_kernel(
    # scalar prefetch
    slots_ref,                    # (L,) int32: packed-buffer row per layer
    # inputs
    h0_ref,                       # (C, B) residual stream entering the stack
    tap_ref,                      # (1, C, B) this layer's ring slot
    wcat_ref,                     # (1, 2G, 2C) [w_cur^T | w_prev^T]
    b_ref,                        # (1, 2G, 1)
    wrs_ref,                      # (1, C+S_l, G) [w_res^T ; w_skip_local^T]
    brs_ref,                      # (1, C+S_l, 1)
    cond_ref,                     # (Cc, B) or None
    wcond_ref,                    # (1, 2G, Cc) or None
    # outputs
    newtap_ref,                   # (1, C, B) same slot (aliased with bufs)
    skip_out_ref,                 # (S_l, B) f32 LOCAL skip accumulator
    # scratch
    h_s,                          # (C, B) f32
    skip_s,                       # (S_l, B) f32
    pair_s,                       # (2C, B) f32 [current h ; dilated tap]
    *,
    compute_dtype,
    n_layers: int,
):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        h_s[:] = h0_ref[:]
        skip_s[:] = jnp.zeros_like(skip_s)

    dt = compute_dtype
    c = h_s.shape[0]

    def mm(w, a):
        # (M, K) @ (K, B) -> (M, B), fp32 accumulation on the MXU.
        return jax.lax.dot_general(
            w.astype(dt), a.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    h = h_s[:]
    # Ring update: this step's h overwrites the tap slot we just consumed
    # (at time t+d the slot is exactly the dilated tap again).
    newtap_ref[0] = h
    pair_s[pl.ds(0, c)] = h
    pair_s[pl.ds(c, c)] = tap_ref[0]

    # Same association as ar_mega: ONE merged tap contraction, biases added
    # outside the matmuls in the split form's order.
    pre = mm(wcat_ref[0], pair_s[:]) + b_ref[0]
    if cond_ref is not None:
        pre = pre + mm(wcond_ref[0], cond_ref[:])
    g = pre.shape[0] // 2
    z = jnp.tanh(pre[:g]) * jax.nn.sigmoid(pre[g:])
    rs = mm(wrs_ref[0], z)                       # (C + S_l, B)
    brs = brs_ref[0]
    h_s[:] = h + rs[:c] + brs[:c]
    skip_s[:] = skip_s[:] + (rs[c:] + brs[c:])

    @pl.when(l == n_layers - 1)
    def _():
        skip_out_ref[:] = skip_s[:]


@functools.partial(jax.jit, static_argnames=("arch", "interpret"))
def tp_fused_stack(
    fm: dict,
    arch: ArchConfig,
    h0: jnp.ndarray,              # (C, B) f32 feature-major residual input
    bufs: jnp.ndarray,            # (sum_d, C, B) packed feature-major rings
    slots: jnp.ndarray,           # (L,) int32 row index per layer
    cond_t: Optional[jnp.ndarray] = None,   # (Cc, B) this step's cond
    interpret: bool = False,
):
    """Run all gated layers; returns (new_bufs, skip_local (S_l, B) f32).

    `fm` holds the PRE-TRANSPOSED weight views built once per trace by
    generate._tp_weights (wcat/b/wrs/brs[/wcond]) — the skip part may be a
    model-axis slice; shapes flow through.
    """
    L = len(arch.dilations)
    c, b = h0.shape
    two_g = fm["wcat"].shape[1]
    cs_l = fm["wrs"].shape[1]            # C + S_local
    cc = fm["wcond"].shape[-1] if cond_t is not None else 0
    dt = jnp.dtype(arch.compute_dtype)

    def layer_block(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda l, slots: (l,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda l, slots: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    tap_spec = pl.BlockSpec(
        (1, c, b), lambda l, slots: (slots[l], 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        whole((c, b)),                   # h0
        tap_spec,                        # tap
        layer_block((two_g, 2 * c)),     # wcat
        layer_block((two_g, 1)),         # b
        layer_block((cs_l, two_g // 2)),  # wrs
        layer_block((cs_l, 1)),          # brs
    ]
    args = [h0, bufs, fm["wcat"], fm["b"], fm["wrs"], fm["brs"]]
    if cond_t is not None:
        in_specs += [whole((cc, b)), layer_block((two_g, cc))]
        args += [cond_t, fm["wcond"]]
        kernel = functools.partial(
            _tp_kernel, compute_dtype=dt, n_layers=L
        )
    else:
        def kernel(slots, h0r, tap, wc, bb, wrs, brs, newtap, skip_out,
                   h_s, skip_s, pair_s):
            return _tp_kernel(
                slots, h0r, tap, wc, bb, wrs, brs, None, None,
                newtap, skip_out, h_s, skip_s, pair_s,
                compute_dtype=dt, n_layers=L,
            )

    s_l = cs_l - c
    new_bufs, skip = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=in_specs,
            out_specs=[tap_spec, whole((s_l, b))],
            scratch_shapes=[
                pltpu.VMEM((c, b), jnp.float32),
                pltpu.VMEM((s_l, b), jnp.float32),
                pltpu.VMEM((2 * c, b), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
            jax.ShapeDtypeStruct((s_l, b), jnp.float32),
        ],
        # call operands: slots(0), h0(1), bufs(2), weights...
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * L * b * (two_g * 2 * c + cs_l * (two_g // 2)),
            bytes_accessed=(
                4 * 2 * L * c * b
                + dt.itemsize * L * (two_g * 2 * c + cs_l * (two_g // 2))
            ),
            transcendentals=2 * L * b * (two_g // 2),
        ),
        interpret=interpret,
    )(slots, *args)
    return new_bufs, skip
