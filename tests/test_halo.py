"""Distributed tier (SURVEY.md §4): halo-exchange sequence parallelism ==
unsharded forward/loss/grads, on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.models.wavenet import forward, init_params
from lb_wavenet_tpu.parallel.halo import (
    sequence_parallel_logits,
    sequence_parallel_loss,
)
from lb_wavenet_tpu.parallel.mesh import make_mesh

from .util import MICRO

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)

B, T = 2, 128  # T divisible by 4 shards; R = 16


def _setup():
    params = init_params(jax.random.key(0), MICRO)
    x = jax.random.randint(jax.random.key(1), (B, T), 0, 256)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    return params, x, mesh


def test_sp_logits_match_unsharded():
    params, x, mesh = _setup()
    ref = jax.jit(lambda p, x: forward(p, MICRO, x))(params, x)
    sp = jax.jit(
        lambda p, x: sequence_parallel_logits(p, MICRO, x, mesh)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_sp_loss_and_grads_match_unsharded():
    params, x, mesh = _setup()
    targets = jax.random.randint(jax.random.key(2), (B, T), 0, 256)
    # Train only positions with full receptive field, as the data layer does.
    loss_mask = jnp.broadcast_to(
        (jnp.arange(T) >= MICRO.receptive_field).astype(jnp.float32), (B, T)
    )

    def ref_loss(p):
        logits = forward(p, MICRO, x)
        ce = -jax.nn.log_softmax(logits, axis=-1)
        ce = jnp.take_along_axis(ce, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * loss_mask) / jnp.sum(loss_mask)

    def sp_loss(p):
        return sequence_parallel_loss(p, MICRO, x, targets, loss_mask, mesh)

    l_ref, g_ref = jax.jit(jax.value_and_grad(ref_loss))(params)
    l_sp, g_sp = jax.jit(jax.value_and_grad(sp_loss))(params)
    assert np.allclose(float(l_ref), float(l_sp), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        g_ref,
        g_sp,
    )
