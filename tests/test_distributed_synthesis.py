"""Distributed tier: fleet (batch-sharded) and model-sharded synthesis ==
single-device synthesis, on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from lb_wavenet_tpu.generate import generate_classes
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.parallel.mesh import make_mesh
from lb_wavenet_tpu.parallel.synthesis import (
    fleet_generate_classes,
    model_sharded_generate_classes,
)

from .util import MICRO

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

B, T = 8, 12


def test_fleet_synthesis_matches_single_device():
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(1)
    ref = generate_classes(params, MICRO, rng, B, T, temperature=0.0)
    mesh = make_mesh(8, 1)
    fleet = fleet_generate_classes(
        params, MICRO, rng, B, T, mesh, engine="xla", temperature=0.0
    )
    assert not fleet.sharding.is_fully_replicated  # actually batch-sharded
    np.testing.assert_array_equal(np.asarray(fleet), np.asarray(ref))


def test_model_sharded_synthesis_matches_single_device():
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(2)
    ref = generate_classes(params, MICRO, rng, B, T, temperature=0.0)
    mesh = make_mesh(2, 4)  # 4-way model sharding (gate/skip dims = 8)
    sharded = model_sharded_generate_classes(
        params, MICRO, rng, B, T, mesh, temperature=0.0
    )
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(ref))
