"""Sequence parallelism for convolution: recompute-with-halo over `shard_map`.

Reference parity: the reference has no sequence parallelism (SURVEY.md §2.3);
its long-sequence mechanism is windowed training with receptive-field left
context. This module is the TPU-native context-parallel equivalent for very
long utterances (SURVEY.md §5 "Long-context"): shard the TIME axis across a
mesh axis, exchange only the `R - 1` boundary SAMPLES with the left neighbor
via `lax.ppermute` over ICI, and let each shard recompute its halo's
activations locally.

Why halo-of-inputs rather than per-layer halo-of-activations: one ppermute of
(B, R-1) int32 per step versus L ppermutes of (B, d_l, C) floats — for
WaveNet-30 that is ~250x less communication at the cost of (R-1)/chunk
recompute (< 5 % for 64k-sample chunks). Dense local recompute is what the
MXU is good at; collectives are what you minimize. Numerical identity with
the unsharded forward is exact (tests/test_halo.py): the first shard masks
its halo via `forward(..., input_mask=...)`, which zeroes both the halo
embeddings AND the residual stream at the masked rows after every layer —
reproducing the pre-sequence zero padding bit-for-bit even with nonzero
(trained) biases (zeroing embeddings alone leaks bias-propagated
activations into the first interior taps; regression-tested).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ArchConfig
from ..models.wavenet import forward


def _sp_local_logits(params, x_local, cond_local=None, speaker_ids=None, *,
                     arch: ArchConfig, axis_name: str, remat: bool = False,
                     fused_stack: bool = False, tapcat: bool = False,
                     fused_frontend: bool = False, return_skip: bool = False):
    """Logits for this shard's chunk, exact vs the unsharded forward.

    x_local: (B, T_local) classes; cond_local: optional (B, T_local, Cc)
    pre-upsampled conditioning (same time sharding — its halo rides the
    same neighbor ring); speaker_ids: optional (B,), replicated (the
    speaker embedding is time-independent). Returns (B, T_local, Q).
    """
    r = arch.receptive_field
    halo = r - 1
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # Right-shift ring: shard i receives the last `halo` samples of shard
    # i-1. Shard 0 receives shard n-1's tail (wraparound) and masks it out
    # (the mask zeroes the residual stream at those rows after every
    # layer, so wraparound garbage — including its cond — never reaches an
    # interior tap).
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(x_local[:, -halo:], axis_name, perm=perm)
    x_ext = jnp.concatenate([recv, x_local], axis=1)
    cond_ext = None
    if cond_local is not None:
        recv_c = jax.lax.ppermute(
            cond_local[:, -halo:], axis_name, perm=perm
        )
        cond_ext = jnp.concatenate([recv_c, cond_local], axis=1)
    mask = jnp.concatenate(
        [
            jnp.broadcast_to(
                (idx > 0).astype(jnp.float32), (x_local.shape[0], halo)
            ),
            jnp.ones_like(x_local, jnp.float32),
        ],
        axis=1,
    )
    if fused_stack:
        # Production-speed SP: the fused Pallas training kernel with its
        # in-kernel residual-stream mask (train_stack.py has_mask) — same
        # logits as the XLA masked forward, ~2x the step throughput.
        from ..train import forward_fused

        logits_ext = forward_fused(
            params, arch, x_ext, cond=cond_ext, speaker_ids=speaker_ids,
            tapcat=tapcat, input_mask=mask, fused_frontend=fused_frontend,
            return_skip=return_skip,
        )
    else:
        logits_ext = forward(
            params, arch, x_ext, input_mask=mask, cond=cond_ext,
            speaker_ids=speaker_ids, remat=remat,
            fused_frontend=fused_frontend, return_skip=return_skip,
        )
    return logits_ext[:, halo:]


def _upsample_for_sp(params, arch: ArchConfig, cond_frames, t: int):
    """Global (unsharded) cond upsampling for the SP paths: frames are
    frame-rate (hop x smaller than samples), so upsampling once outside
    shard_map costs little and keeps the per-shard slices exactly equal to
    the unsharded forward's cond.

    When t exceeds the frames' coverage (seq_batch_to_device zero-pads time
    up to a multiple of the seq-axis size), the upsampled cond is padded
    with ZEROS — never with zero FRAMES, which would pass through the
    upsampler projection as proj_bias != 0 and bleed into the REAL tail
    region through the SAME conv window. The zero-padded cond rows are all
    in the causally-inert, loss-masked pad region, so the real region stays
    bit-identical to the windowed path on trained params."""
    from ..models.conditioning import upsample_cond

    cond = upsample_cond(
        params["upsampler"], arch, cond_frames,
        jnp.dtype(arch.compute_dtype),
    )
    cond = cond[:, :t]
    if cond.shape[1] < t:
        cond = jnp.concatenate(
            [
                cond,
                jnp.zeros(
                    (cond.shape[0], t - cond.shape[1], cond.shape[2]),
                    cond.dtype,
                ),
            ],
            axis=1,
        )
    return cond


def _check_chunking(arch: ArchConfig, t: int, mesh: Mesh, axis_name: str):
    """The single-neighbor exchange needs each chunk to cover the halo."""
    n = mesh.shape[axis_name]
    if t % n:
        raise ValueError(
            f"sequence length {t} must divide across {n} '{axis_name}' shards"
        )
    halo = arch.receptive_field - 1
    if t // n < halo:
        raise ValueError(
            f"per-shard chunk {t // n} < halo {halo} (= receptive_field - 1):"
            f" a chunk must cover the halo it sends to its right neighbor —"
            f" use longer sequences or fewer shards"
        )


def sequence_parallel_logits(
    params,
    arch: ArchConfig,
    x: jnp.ndarray,  # (B, T) with T divisible by the seq-axis size
    mesh: Mesh,
    axis_name: str = "data",
    cond_frames: Optional[jnp.ndarray] = None,  # (B, F, n_mels) frame rate
    speaker_ids: Optional[jnp.ndarray] = None,  # (B,)
    remat: bool = False,
    fused_stack: bool = False,
    tapcat: bool = False,
    fused_frontend: bool = False,
) -> jnp.ndarray:
    """Time-sharded teacher-forced forward over `mesh[axis_name]`.

    Batch stays replicated across the sequence axis; the time dimension of
    both input and output is sharded. Equivalent to `forward(params, arch, x)`
    up to float associativity (exact in fp32 tests). Conditioning: mel
    frames upsample globally (they are hop_size x smaller than samples) and
    the sample-rate cond shards over time with the same halo ring; speaker
    embeddings are time-independent and stay replicated.
    """
    _check_chunking(arch, x.shape[1], mesh, axis_name)
    cond = (
        _upsample_for_sp(params, arch, cond_frames, x.shape[1])
        if cond_frames is not None else None
    )
    args, specs = [params, x], [P(), P(None, axis_name)]
    has_cond, has_spk = cond is not None, speaker_ids is not None
    if has_cond:
        args.append(cond)
        specs.append(P(None, axis_name, None))
    if has_spk:
        args.append(speaker_ids)
        specs.append(P())

    def local(params, x_l, *rest):
        it = iter(rest)
        cond_l = next(it) if has_cond else None
        spk = next(it) if has_spk else None
        return _sp_local_logits(
            params, x_l, cond_l, spk, arch=arch, axis_name=axis_name,
            remat=remat, fused_stack=fused_stack, tapcat=tapcat,
            fused_frontend=fused_frontend,
        )

    fn = shard_map(
        local, mesh=mesh, in_specs=tuple(specs),
        out_specs=P(None, axis_name, None),
        check_vma=not fused_stack,  # pallas calls carry no vma metadata
    )
    return fn(*args)


def sequence_parallel_loss_sums(
    params,
    arch: ArchConfig,
    x: jnp.ndarray,        # (B, T) inputs, T = R-1+W region sharded over time
    targets: jnp.ndarray,  # (B, T) per-position next-sample classes
    loss_mask: jnp.ndarray,  # (B, T) 1 where the position is trained
    mesh: Mesh,
    axis_name: str = "data",
    cond_frames: Optional[jnp.ndarray] = None,  # (B, F, n_mels)
    speaker_ids: Optional[jnp.ndarray] = None,  # (B,)
    remat: bool = False,
    fused_stack: bool = False,
    tapcat: bool = False,
    fused_frontend: bool = False,
    fused_post: bool = False,
) -> tuple:
    """(sum of masked CE, sum of mask) over a time-sharded window — the
    accumulable form (cf. models.wavenet.masked_loss_sums) that SP gradient
    accumulation needs: each microbatch contributes its numerator and
    denominator; the division happens once at the end.

    Unlike the windowed path (targets only for the last W logits), the
    sequence-parallel path scores EVERY position and relies on loss_mask to
    exclude positions without full receptive field — the natural formulation
    when one utterance spans the whole mesh axis. Mel/speaker conditioning
    as in sequence_parallel_logits. fused_stack runs the Pallas training
    kernel per time shard (in-kernel halo mask) at ~2x the XLA step speed.
    """
    _check_chunking(arch, x.shape[1], mesh, axis_name)
    cond = (
        _upsample_for_sp(params, arch, cond_frames, x.shape[1])
        if cond_frames is not None else None
    )
    args = [params, x, targets, loss_mask]
    specs = [P(), P(None, axis_name), P(None, axis_name), P(None, axis_name)]
    has_cond, has_spk = cond is not None, speaker_ids is not None
    if has_cond:
        args.append(cond)
        specs.append(P(None, axis_name, None))
    if has_spk:
        args.append(speaker_ids)
        specs.append(P())

    def local(params, x_l, tgt_l, m_l, *rest):
        it = iter(rest)
        cond_l = next(it) if has_cond else None
        spk = next(it) if has_spk else None
        if fused_post:
            # The SP formulation scores EVERY local position under m_l —
            # exactly the fused post+CE kernel's window_size == t_local
            # case (no statically-skipped head; the mask carries all the
            # exclusion). The psum-reduced (num, den) contract matches the
            # XLA branch below, so grad_accum stays exact.
            from ..ops.pallas.post_loss import fused_post_loss

            skip_l = _sp_local_logits(
                params, x_l, cond_l, spk, arch=arch, axis_name=axis_name,
                remat=remat, fused_stack=fused_stack, tapcat=tapcat,
                fused_frontend=fused_frontend, return_skip=True,
            )
            num_l = fused_post_loss(
                params["post"], skip_l, tgt_l, m_l, skip_l.shape[1],
                compute_dtype=arch.compute_dtype,
                interpret=jax.default_backend() == "cpu",
            )
            num = jax.lax.psum(num_l, axis_name)
            den = jax.lax.psum(jnp.sum(m_l), axis_name)
            return num, den
        logits = _sp_local_logits(
            params, x_l, cond_l, spk, arch=arch, axis_name=axis_name,
            remat=remat, fused_stack=fused_stack, tapcat=tapcat,
            fused_frontend=fused_frontend,
        )
        ce = -jax.nn.log_softmax(logits, axis=-1)
        ce = jnp.take_along_axis(ce, tgt_l[..., None], axis=-1)[..., 0]
        num = jax.lax.psum(jnp.sum(ce * m_l), axis_name)
        den = jax.lax.psum(jnp.sum(m_l), axis_name)
        return num, den

    fn = shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=(P(), P()),
        check_vma=not fused_stack,  # pallas calls carry no vma metadata
    )
    return fn(*args)


def sequence_parallel_loss(params, arch: ArchConfig, x, targets, loss_mask,
                           mesh, **kwargs) -> jnp.ndarray:
    """Masked mean CE over a time-sharded long window (see the sums form)."""
    num, den = sequence_parallel_loss_sums(
        params, arch, x, targets, loss_mask, mesh, **kwargs
    )
    return num / jnp.maximum(den, 1.0)
