"""Distributed synthesis: fleet batch-sharding and GSPMD model sharding.

BASELINE.json north-star: "autoregressive synthesis batches many utterances
per chip and shards the model across chips via GSPMD only if it exceeds one
chip, exchanging logits/state via ICI collectives."

* Fleet synthesis (the common case): every chip owns a batch shard of the
  utterances; the model is replicated. One jitted call over the mesh — GSPMD
  partitions the whole scan by batch with zero collectives in the loop.
* Model-sharded synthesis (models larger than one chip, e.g. the 512-skip
  stress config grown further): stacked weights are sharded on their
  skip/gate channel dimensions over the `model` axis; GSPMD inserts the
  ICI all-reduces for the skip accumulation / post-network contractions
  inside the sample loop. Same XLA engine code — sharding is entirely
  expressed through NamedSharding on the inputs (the TPU way: no manual
  collectives in model code).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ArchConfig
from ..generate import generate_classes
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS


def fleet_generate_classes(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    engine: str = "mega",
    **kwargs,
):
    """Batch-sharded generation over the mesh's data axis.

    `batch` is the GLOBAL utterance count; it must divide by the data-axis
    size (and per-chip batch must satisfy the engine's constraints).
    """
    n_data = mesh.shape[DATA_AXIS]
    if batch % n_data:
        raise ValueError(f"global batch {batch} % data axis {n_data} != 0")
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)
    rng = jax.device_put(rng, replicated)

    out_shardings = NamedSharding(mesh, P(DATA_AXIS, None))
    fn = jax.jit(
        lambda p, r: generate_classes(
            p, arch, r, batch, n_samples, engine=engine, **kwargs
        ),
        out_shardings=out_shardings,
        static_argnames=(),
    )
    return fn(params, rng)


def model_sharded_param_specs(params) -> dict:
    """PartitionSpecs sharding the wide channel dims over `model`.

    Gate channels (2G) of the dilated-tap weights and skip channels (S) of
    the skip/post weights are the natural split: each chip computes a slice
    of every gate and of the skip accumulator; GSPMD reduces where needed.
    """

    def spec(path, leaf):
        names = [getattr(p2, "key", getattr(p2, "name", None)) for p2 in path]
        if "layers" in names:
            leafname = names[-1]
            if leafname in ("w_cur", "w_prev", "w_cond", "w_gcond"):
                return P(None, None, MODEL_AXIS)   # (L, C, 2G): shard 2G
            if leafname == "b":
                return P(None, MODEL_AXIS)         # (L, 2G)
            if leafname == "w_res":
                return P(None, MODEL_AXIS, None)   # (L, G, C): shard G (contraction)
            if leafname == "w_skip":
                return P(None, MODEL_AXIS, None)   # (L, G, S): shard G
        if "post" in names:
            if names[-1] == "w1":
                return P(MODEL_AXIS, None)         # (S, S): shard rows
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def model_sharded_generate_classes(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    **kwargs,
):
    """Generation with the model sharded over the `model` mesh axis.

    Uses the XLA engine (GSPMD freely repartitions it; the hand-written
    Pallas kernels are single-chip programs and run in the fleet path).
    """
    specs = model_sharded_param_specs(params)
    params = jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs
    )
    rng = jax.device_put(rng, NamedSharding(mesh, P()))
    fn = jax.jit(
        lambda p, r: generate_classes(
            p, arch, r, batch, n_samples, engine="xla", **kwargs
        ),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(params, rng)
