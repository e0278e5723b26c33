"""Kernel-parity tier: fused training-stack kernel (fwd + custom-VJP bwd)
== XLA reference path, values AND gradients, in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.models.wavenet import (
    forward,
    gated_unit,
    init_params,
    input_frontend,
    shift_right,
)
from lb_wavenet_tpu.ops.pallas.train_stack import make_fused_stack

from .util import MICRO

B, T = 2, 48


def _xla_stack(lp, arch, h0, cond=None):
    """Reference: the layer loop + stacked-skip einsum from forward()."""
    dtype = jnp.dtype(arch.compute_dtype)
    h = h0
    zs = []
    for i, d in enumerate(arch.dilations):
        h, z = gated_unit(h, shift_right(h, d), lp, i, dtype, cond=cond)
        zs.append(z)
    z_all = jnp.stack(zs, axis=0)
    return jax.lax.dot_general(
        z_all.astype(dtype),
        lp["w_skip"].astype(dtype),
        (((0, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jnp.sum(lp["b_skip"], axis=0)


def _setup(arch, with_cond=False, seed=0):
    params = init_params(jax.random.key(seed), arch)
    lp = dict(params["layers"])
    h0 = jax.random.normal(
        jax.random.key(seed + 1), (B, T, arch.residual_channels)
    )
    cond = (
        jax.random.normal(jax.random.key(seed + 2), (B, T, arch.cond_channels))
        if with_cond
        else None
    )
    return lp, h0, cond


@pytest.mark.parametrize("tapcat", [False, True])
def test_fused_stack_forward_matches_xla(tapcat):
    lp, h0, _ = _setup(MICRO)
    fused = make_fused_stack(MICRO, has_cond=False, interpret=True,
                             tapcat=tapcat)
    dummy = jnp.zeros((B, T, 1))
    got = fused(lp, h0, dummy)
    want = _xla_stack(lp, MICRO, h0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("tapcat", [False, True])
def test_fused_stack_grads_match_xla(tapcat):
    lp, h0, _ = _setup(MICRO, seed=3)
    fused = make_fused_stack(MICRO, has_cond=False, interpret=True,
                             tapcat=tapcat)
    dummy = jnp.zeros((B, T, 1))
    g = jax.random.normal(jax.random.key(9), (B, T, MICRO.skip_channels))

    def loss_fused(lp, h0):
        return jnp.sum(fused(lp, h0, dummy) * g)

    def loss_xla(lp, h0):
        return jnp.sum(_xla_stack(lp, MICRO, h0) * g)

    (dlp_f, dh0_f) = jax.grad(loss_fused, argnums=(0, 1))(lp, h0)
    (dlp_x, dh0_x) = jax.grad(loss_xla, argnums=(0, 1))(lp, h0)
    np.testing.assert_allclose(
        np.asarray(dh0_f), np.asarray(dh0_x), rtol=2e-4, atol=2e-4
    )
    for k in dlp_x:
        np.testing.assert_allclose(
            np.asarray(dlp_f[k]),
            np.asarray(dlp_x[k]),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"grad mismatch for layers.{k}",
        )


@pytest.mark.parametrize("tapcat", [False, True])
def test_fused_stack_conditioned_grads(tapcat):
    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4,),
        compute_dtype="float32",
    )
    lp, h0, cond = _setup(arch, with_cond=True, seed=5)
    fused = make_fused_stack(arch, has_cond=True, interpret=True,
                             tapcat=tapcat)
    g = jax.random.normal(jax.random.key(11), (B, T, arch.skip_channels))

    def loss_fused(lp, h0, cond):
        return jnp.sum(fused(lp, h0, cond) * g)

    def loss_xla(lp, h0, cond):
        return jnp.sum(_xla_stack(lp, arch, h0, cond) * g)

    out_f = fused(lp, h0, cond)
    out_x = _xla_stack(lp, arch, h0, cond)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )
    grads_f = jax.grad(loss_fused, argnums=(0, 1, 2))(lp, h0, cond)
    grads_x = jax.grad(loss_xla, argnums=(0, 1, 2))(lp, h0, cond)
    for a, b in zip(jax.tree_util.tree_leaves(grads_f),
                    jax.tree_util.tree_leaves(grads_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_fused_train_step_matches_xla_train_step():
    """Full train_step with fused_stack=True tracks the XLA step: identical
    batches, near-identical loss and updated params."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from lb_wavenet_tpu.train import init_state, train_step

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    rngs = np.random.default_rng(0)
    r = MICRO.receptive_field
    w = 32
    raw = {
        "inputs": rngs.integers(0, 256, (2, r - 1 + w)).astype(np.int32),
        "targets": rngs.integers(0, 256, (2, w)).astype(np.int32),
        "mask": np.ones((2, w), np.float32),
    }
    losses, states = [], []
    for fused, tapcat in ((False, False), (True, False), (True, True)):
        train = TrainConfig(batch_size=2, window_size=w, learning_rate=1e-3,
                            fused_stack=fused, tapcat=tapcat)
        state = shard_params(init_state(jax.random.key(0), MICRO, train), mesh)
        state, loss = train_step(state, shard_batch(raw, mesh), MICRO, train)
        losses.append(float(loss))
        states.append(state)
    for i in (1, 2):
        assert np.allclose(losses[0], losses[i], rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            ),
            states[0].params,
            states[i].params,
        )


def test_fused_post_loss_matches_xla_loss_and_grads():
    """fused_post (ops/pallas/post_loss.py): loss value and EVERY gradient
    (post weights, stack weights via dskip, embeddings via dh0) track the
    XLA post+CE path — interpret mode, fp32, boundary-masked batch."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.train import loss_sums_fn

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    w, b = 200, 3
    r = arch.receptive_field
    rng = np.random.default_rng(3)
    batch = {
        "inputs": jnp.asarray(rng.integers(0, 256, (b, r - 1 + w)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 256, (b, w)), jnp.int32),
        "mask": jnp.asarray((rng.random((b, w)) > 0.15).astype(np.float32)),
    }
    params = init_params(jax.random.key(0), arch)

    def val_grads(tr):
        def lf(p):
            num, den = loss_sums_fn(p, arch, w, batch, tr)
            return num / jnp.maximum(den, 1.0)

        return jax.value_and_grad(lf)(params)

    for stack in (False, True):
        lx, gx = val_grads(TrainConfig(
            batch_size=b, window_size=w, fused_stack=stack, tapcat=stack,
        ))
        lf_, gf = val_grads(TrainConfig(
            batch_size=b, window_size=w, fused_stack=stack, tapcat=stack,
            fused_post=True,
        ))
        assert abs(float(lx) - float(lf_)) < 2e-5, stack
        fx, _ = jax.flatten_util.ravel_pytree(gx)
        ff, _ = jax.flatten_util.ravel_pytree(gf)
        np.testing.assert_allclose(
            np.asarray(ff), np.asarray(fx), rtol=2e-4, atol=2e-6,
            err_msg=f"fused_stack={stack}",
        )


def test_fused_post_grad_accum_matches_one_shot():
    """grad_accum with fused_post: the num/den accumulation stays exact
    (loss equal to the one-shot step; params track to tolerance)."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    w, b = 96, 4
    r = arch.receptive_field
    rng = np.random.default_rng(5)
    batch = {
        "inputs": jnp.asarray(rng.integers(0, 256, (b, r - 1 + w)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 256, (b, w)), jnp.int32),
        "mask": jnp.ones((b, w), jnp.float32),
    }
    outs = []
    for accum in (1, 2):
        tr = TrainConfig(
            batch_size=b, window_size=w, learning_rate=1e-3,
            fused_stack=True, tapcat=True, fused_post=True,
            grad_accum=accum,
        )
        state = init_state(jax.random.key(1), arch, tr)
        state, loss = train_step(state, batch, arch, tr)
        outs.append((float(loss), state.params))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5
    a, _ = jax.flatten_util.ravel_pytree(outs[0][1])
    c, _ = jax.flatten_util.ravel_pytree(outs[1][1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)


def test_fused_post_in_sequence_parallel_matches_xla_post():
    """r3: fused_post now runs under SP (window_size == t_local, mask
    carries the exclusion): loss and grads match the XLA-post SP path."""
    from lb_wavenet_tpu.parallel.halo import sequence_parallel_loss_sums
    from lb_wavenet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 1)
    params = init_params(jax.random.key(0), MICRO)
    rng = np.random.default_rng(9)
    b = 2
    t = 4 * max(64, MICRO.receptive_field - 1)
    x = jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32)
    msk = jnp.asarray((rng.random((b, t)) > 0.2).astype(np.float32))

    def lf(p, fp):
        num, den = sequence_parallel_loss_sums(
            p, MICRO, x, tgt, msk, mesh, fused_stack=True, tapcat=True,
            fused_post=fp,
        )
        return num / jnp.maximum(den, 1.0)

    l_x, g_x = jax.jit(jax.value_and_grad(lambda p: lf(p, False)))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(lambda p: lf(p, True)))(params)
    assert abs(float(l_x) - float(l_f)) < 2e-5
    fx, _ = jax.flatten_util.ravel_pytree(g_x)
    ff, _ = jax.flatten_util.ravel_pytree(g_f)
    np.testing.assert_allclose(
        np.asarray(ff), np.asarray(fx), rtol=2e-4, atol=2e-6
    )


def test_mm_embed_grad_matches_scatter_grad():
    """TrainConfig.mm_embed_grad (one-hot MXU contraction instead of the
    gather's scatter-add VJP): forward identical, every gradient equal to
    f32 rounding — the HIGHEST-precision one-hot contraction is exact."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.train import loss_sums_fn

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    w, b = 150, 3
    r = arch.receptive_field
    rng = np.random.default_rng(0)
    batch = {
        "inputs": jnp.asarray(rng.integers(0, 256, (b, r - 1 + w)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 256, (b, w)), jnp.int32),
        "mask": jnp.ones((b, w), jnp.float32),
    }
    params = init_params(jax.random.key(0), arch)

    def grads(mm):
        tr = TrainConfig(batch_size=b, window_size=w, mm_embed_grad=mm)

        def lf(p):
            num, den = loss_sums_fn(p, arch, w, batch, tr)
            return num / jnp.maximum(den, 1.0)

        return jax.value_and_grad(lf)(params)

    l0, g0 = grads(False)
    l1, g1 = grads(True)
    assert float(l0) == float(l1)
    f0, _ = jax.flatten_util.ravel_pytree(g0)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-7)


def test_fused_frontend_forward_bitexact():
    """fused_frontend (ops/pallas/frontend.py): the one-hot MXU embedding +
    width-K causal conv kernel is BIT-EXACT vs input_frontend — bf16 and
    f32 compute, K in {1, 2, 3}, with and without the SP input mask."""
    rng = np.random.default_rng(0)
    for dtype in ("bfloat16", "float32"):
        for k in (1, 2, 3):
            arch = ArchConfig(
                n_blocks=2, n_layers_per_block=3, residual_channels=16,
                skip_channels=32, gate_channels=16, input_kernel=k,
                compute_dtype=dtype,
            )
            params = init_params(jax.random.key(k), arch)
            x = jnp.asarray(rng.integers(0, 256, (2, 210)), jnp.int32)
            mask = jnp.asarray(
                (rng.random((2, 210)) > 0.3).astype(np.float32)
            )
            dt = jnp.dtype(dtype)
            for m in (None, mask):
                ref = input_frontend(params, arch, x, dt, input_mask=m)
                got = input_frontend(
                    params, arch, x, dt, input_mask=m, fused_frontend=True
                )
                np.testing.assert_array_equal(
                    np.asarray(ref), np.asarray(got),
                    err_msg=f"dtype={dtype} K={k} mask={m is not None}",
                )


@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_frontend_grads(use_mask):
    """Gradient parity: d_embed element-exact (the kernel replicates the
    XLA VJP's per-tap compute-dtype cotangent rounding before the exact
    one-hot transpose contraction), d_b to summation order, d_w within one
    compute-dtype ulp (the kernel keeps the f32 tile-sum that XLA rounds)."""
    rng = np.random.default_rng(7)
    for dtype, w_tol in (("float32", 3e-6), ("bfloat16", 2e-2)):
        arch = ArchConfig(
            n_blocks=2, n_layers_per_block=3, residual_channels=16,
            skip_channels=32, gate_channels=16, input_kernel=2,
            compute_dtype=dtype,
        )
        params = init_params(jax.random.key(1), arch)
        x = jnp.asarray(rng.integers(0, 256, (2, 300)), jnp.int32)
        mask = (
            jnp.asarray((rng.random((2, 300)) > 0.3).astype(np.float32))
            if use_mask else None
        )
        dt = jnp.dtype(dtype)
        probe = jnp.asarray(
            rng.standard_normal((2, 300, 16)), jnp.float32
        )

        def loss(p, fused):
            h = input_frontend(
                p, arch, x, dt, input_mask=mask, fused_frontend=fused
            )
            return jnp.sum(h * probe)

        g_ref = jax.grad(lambda p: loss(p, False))(params)
        g_new = jax.grad(lambda p: loss(p, True))(params)
        np.testing.assert_array_equal(
            np.asarray(g_ref["embed"]), np.asarray(g_new["embed"]),
            err_msg=f"d_embed dtype={dtype}",
        ) if dtype == "bfloat16" else np.testing.assert_allclose(
            np.asarray(g_ref["embed"]), np.asarray(g_new["embed"]),
            atol=1e-5, err_msg=f"d_embed dtype={dtype}",
        )
        np.testing.assert_allclose(
            np.asarray(g_ref["input_conv"]["b"]),
            np.asarray(g_new["input_conv"]["b"]), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g_ref["input_conv"]["w"]),
            np.asarray(g_new["input_conv"]["w"]), atol=w_tol,
            err_msg=f"d_w dtype={dtype}",
        )


def test_fused_frontend_train_step_matches():
    """Full production-recipe step (fused_stack+tapcat+fused_post+
    fused_frontend) tracks the same step with the XLA frontend."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.train import init_state, train_step

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
    )
    w, b = 96, 2
    r = arch.receptive_field
    rng = np.random.default_rng(11)
    batch = {
        "inputs": jnp.asarray(rng.integers(0, 256, (b, r - 1 + w)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 256, (b, w)), jnp.int32),
        "mask": jnp.ones((b, w), jnp.float32),
    }
    outs = []
    for ff in (False, True):
        tr = TrainConfig(
            batch_size=b, window_size=w, learning_rate=1e-3,
            fused_stack=True, tapcat=True, fused_post=True,
            fused_frontend=ff,
        )
        state = init_state(jax.random.key(2), arch, tr)
        state, loss = train_step(state, batch, arch, tr)
        outs.append((float(loss), state.params))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5
    a, _ = jax.flatten_util.ravel_pytree(outs[0][1])
    c, _ = jax.flatten_util.ravel_pytree(outs[1][1])
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)


def test_full_recipe_mel_conditioned_matches_xla_post():
    """Production config 3 combination (mel + fused_stack + tapcat +
    fused_post + fused_frontend): loss and grads match the same step with
    the XLA post/frontend — the exact flag set configs/wavenet30_mel.json
    ships."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.train import loss_sums_fn

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=32, gate_channels=16, compute_dtype="float32",
        n_mels=8, cond_channels=16, upsample_factors=(4, 4),
    )
    w, b = 96, 2
    r = arch.receptive_field
    rng = np.random.default_rng(13)
    t_in = r - 1 + w
    batch = {
        "inputs": jnp.asarray(rng.integers(0, 256, (b, t_in)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, 256, (b, w)), jnp.int32),
        "mask": jnp.ones((b, w), jnp.float32),
        "mel": jnp.asarray(rng.standard_normal(
            (b, -(-t_in // arch.hop_size), arch.n_mels)
        ), jnp.float32),
    }
    params = init_params(jax.random.key(0), arch)

    def val_grads(full):
        tr = TrainConfig(
            batch_size=b, window_size=w, fused_stack=True, tapcat=True,
            fused_post=full, fused_frontend=full,
        )

        def lf(p):
            num, den = loss_sums_fn(p, arch, w, batch, tr)
            return num / jnp.maximum(den, 1.0)

        return jax.value_and_grad(lf)(params)

    l_x, g_x = val_grads(False)
    l_f, g_f = val_grads(True)
    assert abs(float(l_x) - float(l_f)) < 2e-5
    fx, _ = jax.flatten_util.ravel_pytree(g_x)
    ff, _ = jax.flatten_util.ravel_pytree(g_f)
    np.testing.assert_allclose(
        np.asarray(ff), np.asarray(fx), rtol=2e-4, atol=2e-6
    )
