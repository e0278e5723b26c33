"""Fused Pallas AR sample-step kernel: the whole dilated stack in one kernel.

Reference parity: this is the TPU-native replacement for the reference's
per-layer cached-queue update graph (SURVEY.md §3.2): one `pallas_call` per
sample step computes ALL gated residual layers, reading each layer's dilated
tap from the packed HBM ring buffer and writing the current activation back
into the same slot.

Design (see SURVEY.md §7 "hard parts" — this is the central kernel):
  * Grid over layers. The TPU grid is sequential, so the residual stream `h`
    and the skip accumulator live in VMEM scratch carried across grid steps.
  * Ring-buffer slots are data-dependent (t mod d_l): the slot row of every
    layer is computed in XLA as an (L,) int32 array and SCALAR-PREFETCHED
    (`pltpu.PrefetchScalarGridSpec`), so each layer's tap block is DMA'd
    HBM→VMEM by the normal Pallas pipeline, overlapped with the previous
    layer's compute — no manual DMA code.
  * The packed buffer is input/output ALIASED: layer l's block is written
    back to the same slot (ring update in place, no data movement); blocks
    of rows not addressed this step keep their aliased input contents.
    Cross-layer slot regions are disjoint, so pipelined prefetch of layer
    l+1's tap can never race layer l's write-back.
  * Weights stream through VMEM one layer at a time via BlockSpec indexing
    (auto double-buffered). Matmuls run on the MXU in the configured compute
    dtype with fp32 accumulation.

The kernel computes the skip sum; the (tiny) post-network + categorical
sampling stay in XLA. Conditioning enters as an optional per-step (B, 2G)
bias addend per layer via in-kernel matmul against w_cond/w_gcond.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ArchConfig


def _stack_kernel(
    # scalar prefetch
    slots_ref,                    # (L,) int32: packed-buffer row per layer
    # inputs (per-layer blocks unless noted)
    h0_ref,                       # (B, C) initial residual stream (whole)
    tap_ref,                      # (1, B, C) this layer's ring slot
    wc_ref,                       # (1, C, 2G)
    wp_ref,                       # (1, C, 2G)
    b_ref,                        # (1, 1, 2G)
    wr_ref,                       # (1, G, C)
    br_ref,                       # (1, 1, C)
    ws_ref,                       # (1, G, S)
    bs_ref,                       # (1, 1, S)
    cond_ref,                     # (B, Cc) current-step conditioning (whole) or None
    wcond_ref,                    # (1, Cc, 2G) or None
    # outputs
    newtap_ref,                   # (1, B, C) same slot (aliased with bufs)
    skip_out_ref,                 # (B, S)
    # scratch
    h_s,                          # (B, C) f32
    skip_s,                       # (B, S) f32
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
    h = h_s[:]
    h_prev = tap_ref[0]
    # Ring update: current input overwrites the tap we just consumed.
    newtap_ref[0] = h.astype(newtap_ref.dtype)

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dt),
            w.astype(dt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    pre = mm(h, wc_ref[0]) + mm(h_prev.astype(jnp.float32), wp_ref[0]) + b_ref[0, 0]
    if cond_ref is not None:
        pre = pre + mm(cond_ref[:], wcond_ref[0])
    g = pre.shape[-1] // 2
    z = jnp.tanh(pre[:, :g]) * jax.nn.sigmoid(pre[:, g:])
    h_s[:] = h + mm(z, wr_ref[0]) + br_ref[0, 0]
    skip_s[:] = skip_s[:] + mm(z, ws_ref[0]) + bs_ref[0, 0]

    @pl.when(l == n_layers - 1)
    def _():
        skip_out_ref[:] = skip_s[:]


@functools.partial(
    jax.jit, static_argnames=("arch", "interpret")
)
def fused_stack(
    layer_params: dict,
    arch: ArchConfig,
    h0: jnp.ndarray,              # (B, C) fp32 residual stream after input conv
    bufs: jnp.ndarray,            # (sum_d, B, C) packed ring buffers
    slots: jnp.ndarray,           # (L,) int32 row index per layer
    cond_t: Optional[jnp.ndarray] = None,   # (B, Cc) conditioning for step t
    interpret: bool = False,
):
    """Run all gated layers; returns (new_bufs, skip_sum (B, S) fp32)."""
    lp = layer_params
    L = len(arch.dilations)
    b, c = h0.shape
    two_g = lp["w_cur"].shape[-1]
    gch = two_g // 2
    s = lp["w_skip"].shape[-1]  # may be a model-axis slice of skip_channels
    cc = lp["w_cond"].shape[1] if cond_t is not None else 0
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

    in_specs = [
        whole((b, c)),                       # h0
        pl.BlockSpec(                        # tap: slot row per layer
            (1, b, c),
            lambda l, slots: (slots[l], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        layer_block((c, two_g)),             # w_cur
        layer_block((c, two_g)),             # w_prev
        layer_block((1, two_g)),             # b (as (L,1,2G))
        layer_block((gch, c)),               # w_res
        layer_block((1, c)),                 # b_res (as (L,1,C))
        layer_block((gch, s)),               # w_skip
        layer_block((1, s)),                 # b_skip (as (L,1,S))
    ]
    args = [
        h0,
        bufs,
        lp["w_cur"],
        lp["w_prev"],
        lp["b"][:, None, :],
        lp["w_res"],
        lp["b_res"][:, None, :],
        lp["w_skip"],
        lp["b_skip"][:, None, :],
    ]
    if cond_t is not None:
        in_specs += [whole((b, cc)), layer_block((cc, two_g))]
        args += [cond_t, lp["w_cond"]]
        kernel = functools.partial(
            _stack_kernel, compute_dtype=dt, n_layers=L
        )
    else:
        # Positional ref order is fixed by pallas (inputs, outputs, scratch):
        # without conditioning inputs the kernel signature must not contain
        # the cond refs at all.
        def kernel(slots, h0, tap, wc, wp, bb, wr, br, ws, bs, newtap, skip_out, h_s, skip_s):
            return _stack_kernel(
                slots, h0, tap, wc, wp, bb, wr, br, ws, bs,
                None, None,
                newtap, skip_out, h_s, skip_s,
                compute_dtype=dt, n_layers=L,
            )

    flops_per_layer = 2 * b * (2 * c * two_g + gch * c + gch * s)
    new_bufs, skip = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, b, c),
                    lambda l, slots: (slots[l], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                whole((b, s)),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, c), jnp.float32),
                pltpu.VMEM((b, s), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
            jax.ShapeDtypeStruct((b, s), jnp.float32),
        ],
        # arg order at call: slots(0), h0(1), bufs(2), weights...; alias the
        # packed buffer onto output 0 for the in-place ring update.
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=L * flops_per_layer,
            bytes_accessed=(
                bufs.dtype.itemsize * 2 * L * b * c
                + dt.itemsize * L * (2 * c * two_g + gch * c + gch * s)
            ),
            transcendentals=2 * L * b * gch,
        ),
        interpret=interpret,
    )(slots, *args)
    return new_bufs, skip


def pallas_stack_step(
    params: dict,
    arch: ArchConfig,
    state,
    t: jnp.ndarray,
    x_class: jnp.ndarray,
    cond_t: Optional[jnp.ndarray] = None,
    gcond: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    model_axis: Optional[str] = None,
):
    """Drop-in replacement for generate.stack_step using the fused kernel.

    `model_axis` (shard_map TP synthesis, parallel/synthesis.py): the
    caller passes w_skip/b_skip sliced on the skip dim and post.w1 sliced
    on its contraction rows; the kernel computes the LOCAL skip slice
    (shapes flow through) and the post hidden is completed with one
    psum over the axis — the only collective in the sample loop.
    """
    from ...generate import buffer_offsets, post_network_sharded
    from ...models.wavenet import post_network

    dtype = jnp.dtype(arch.compute_dtype)
    k_taps = arch.input_kernel

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(dtype),
            w.astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    e = params["embed"][x_class]
    w_in = params["input_conv"]["w"]
    h = params["input_conv"]["b"].astype(jnp.float32) + mm(e, w_in[k_taps - 1])
    for j in range(k_taps - 1):
        h = h + mm(state.embed_buf[j], w_in[j])
    new_embed_buf = (
        jnp.concatenate(
            [state.embed_buf[1:], e[None].astype(state.embed_buf.dtype)], axis=0
        )
        if k_taps > 1
        else state.embed_buf
    )

    # Fold global conditioning into the per-step local conditioning vector by
    # concatenation at trace level: both are (B, X) biases through a matmul.
    if gcond is not None and cond_t is not None:
        cond_t = jnp.concatenate([cond_t, gcond], axis=-1)
        lp = dict(params["layers"])
        lp["w_cond"] = jnp.concatenate(
            [params["layers"]["w_cond"], params["layers"]["w_gcond"]], axis=1
        )
    elif gcond is not None:
        cond_t = gcond
        lp = dict(params["layers"])
        lp["w_cond"] = params["layers"]["w_gcond"]
    else:
        lp = params["layers"]

    offsets = jnp.asarray(buffer_offsets(arch), jnp.int32)
    dils = jnp.asarray(arch.dilations, jnp.int32)
    slots = offsets + jax.lax.rem(t, dils)

    new_bufs, skip = fused_stack(
        lp, arch, h, state.bufs, slots, cond_t=cond_t, interpret=interpret
    )
    if model_axis is not None:
        logits = post_network_sharded(params, skip, dtype, model_axis)
    else:
        logits = post_network(params, skip, dtype)
    return new_embed_buf, new_bufs, logits
