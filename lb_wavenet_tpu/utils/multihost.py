"""Multi-host guards (SURVEY.md §5 "Race detection / sanitizers" (c)).

JAX SPMD requires every process to run the identical program on identical
replicated values; silent divergence (e.g. a non-deterministic input
pipeline) corrupts training without crashing. Guard: a cheap parameter
checksum, all-gathered across processes every K steps and asserted equal.
Single-process runs reduce to a no-op comparison.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _checksum_impl(leaves):
    acc = jnp.zeros((), jnp.float32)
    for i, leaf in enumerate(leaves):
        x = jnp.asarray(leaf, jnp.float32)
        # Weighted sums make the checksum sensitive to permutations.
        acc = acc + jnp.sum(x) * (1.0 + 0.001 * i) + jnp.sum(x * x) * 0.5
    return acc


def params_checksum(params) -> jnp.ndarray:
    """Order-stable scalar fingerprint of a parameter pytree (fp32).

    Jitted: under multi-process MODEL sharding the leaves are global
    arrays no single process holds in full — eager per-op reduction would
    sum only the LOCAL shards, making hosts on different model columns
    "diverge" spuriously (caught by the r5 4-process data x model test).
    Inside jit the sum is a global computation with a replicated result.
    """
    return _checksum_impl(jax.tree_util.tree_leaves(params))


def assert_replicated_params(params, step: int) -> None:
    """Raise if hosts disagree on the parameter checksum."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    local = np.asarray(params_checksum(params))
    gathered = multihost_utils.process_allgather(local)
    if not np.allclose(gathered, gathered[0], rtol=0, atol=0):
        raise RuntimeError(
            f"Cross-host parameter divergence at step {step}: "
            f"checksums {gathered.tolist()}"
        )
