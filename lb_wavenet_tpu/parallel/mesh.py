"""Device mesh + sharding layout.

The reference is single-device (SURVEY.md §2.3: no DP/TP/PP/SP/EP); the
TPU-native framework scales with GSPMD instead: a ('data', 'model') mesh,
batches sharded on `data` (gradient all-reduce emitted by the compiler over
ICI/DCN), and optional channel sharding of the conv weights on `model` for
models that exceed one chip (BASELINE.json: "shards the model across chips
via GSPMD only if it exceeds one chip").
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_data: int = -1, mesh_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_data == -1:
        mesh_data = n // mesh_model
    if mesh_data * mesh_model > n:
        raise ValueError(
            f"mesh {mesh_data}x{mesh_model} exceeds {n} available devices"
        )
    # An explicit smaller mesh uses a device subset (e.g. tiny-batch runs).
    dev_array = np.asarray(devices[: mesh_data * mesh_model]).reshape(
        mesh_data, mesh_model
    )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_pspec() -> P:
    """Batch arrays: leading (batch) dim over `data`, rest replicated."""
    return P(DATA_AXIS)


def param_pspec(path: tuple, leaf) -> P:
    """Parameter layout.

    WaveNet parameters are far below one v5e chip's HBM, so the default is
    full replication; the `model` axis shards the wide skip/post matrices on
    their skip-channel dimension when mesh_model > 1 (the 512-skip stress
    config). Channel dims are the LAST two axes of the stacked (L, Cin, Cout)
    arrays; we shard Cout of w_skip / rows of post.w1 etc.
    """
    names = [getattr(p, "name", getattr(p, "key", None)) for p in path]
    if "w_skip" in names:
        return P(None, None, MODEL_AXIS)  # (L, G, S): shard S
    if "b_skip" in names:
        return P(None, MODEL_AXIS)
    if "post" in names and "w1" in names:
        return P(MODEL_AXIS, None)  # (S, S): shard rows (matches skip split)
    return P()


def shard_params(tree: Any, mesh: Mesh) -> Any:
    """Place a (params/opt_state/...) pytree onto the mesh per param_pspec."""

    def place(path, leaf):
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            spec = P()
        else:
            spec = param_pspec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host-local numpy batch -> global sharded jax.Arrays over `data`.

    Single-process: a plain device_put with the batch sharding. Multi-process:
    each host contributes its local rows of the global batch via
    `make_array_from_process_local_data`.
    """
    sharding = NamedSharding(mesh, batch_pspec())
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
