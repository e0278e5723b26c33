"""Distributed tier: fleet (batch-sharded) and model-sharded synthesis ==
single-device synthesis, on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
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


def test_fused_engine_fleet_runs_per_shard_kernels():
    """Pallas engines fleet via shard_map: greedy output == single device."""
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(3)
    ref = generate_classes(
        params, MICRO, rng, B, T, engine="pallas", temperature=0.0
    )
    mesh = make_mesh(4, 1)
    fleet = fleet_generate_classes(
        params, MICRO, rng, B, T, mesh, engine="pallas", temperature=0.0
    )
    assert not fleet.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(fleet), np.asarray(ref))


def test_fused_fleet_sampled_rng_contract():
    """Sampled fused fleet: each data shard equals a single-chip run of that
    shard with the fold_in(rng, shard_index) key (the documented contract)."""
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(7)
    mesh = make_mesh(4, 1)
    fleet = np.asarray(fleet_generate_classes(
        params, MICRO, rng, B, T, mesh, engine="pallas", temperature=1.0
    ))
    shard_b = B // 4
    for i in range(4):
        solo = generate_classes(
            params, MICRO, jax.random.fold_in(rng, i), shard_b, T,
            engine="pallas", temperature=1.0,
        )
        np.testing.assert_array_equal(
            fleet[i * shard_b : (i + 1) * shard_b], np.asarray(solo)
        )


def test_combined_data_model_mesh():
    """Fleet batch-sharding composes with model sharding on one mesh."""
    from lb_wavenet_tpu.parallel.synthesis import mesh_generate_classes

    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(4)
    ref = generate_classes(params, MICRO, rng, B, T, temperature=0.0)
    mesh = make_mesh(2, 4)
    out = mesh_generate_classes(
        params, MICRO, rng, B, T, mesh, engine="xla", temperature=0.0
    )
    assert not out.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fleet_shards_forced_priming():
    """`forced` priming rows ride the data axis: primed fleet == primed solo."""
    params = init_params(jax.random.key(0), MICRO)
    rng = jax.random.key(5)
    forced = np.full((B, T), -1, np.int32)
    # Distinct primer per lane so a mis-sharded forced matrix would show.
    forced[:, : T // 2] = (
        np.arange(B)[:, None] * 7 + np.arange(T // 2)[None, :]
    ) % 256
    ref = generate_classes(
        params, MICRO, rng, B, T, forced=jnp.asarray(forced), temperature=0.0
    )
    mesh = make_mesh(8, 1)
    fleet = fleet_generate_classes(
        params, MICRO, rng, B, T, mesh, engine="xla", forced=forced,
        temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(fleet), np.asarray(ref))


def test_model_sharded_tp_mega_matches_single_device():
    """r4 (VERDICT r3 item 4): TP at MEGA-kernel speed — the per-step
    skip-psum shard_map variant (ops/pallas/ar_tp.py). Greedy and sampled
    classes equal the single-device MEGA run (the TP step mirrors mega's
    merged-contraction accumulation order and consumes the same per-lane
    hash noise; fold_in RNG contract as everywhere)."""
    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(11)
    mesh = make_mesh(1, 8)  # pure model axis: skip 8 -> 1 channel/shard
    for temp, label in ((0.0, "greedy"), (1.0, "sampled")):
        ref = np.asarray(generate_classes(
            params, MICRO, jax.random.fold_in(key, 0), B, T,
            temperature=temp, engine="mega",
        ))
        out = model_sharded_generate_classes(
            params, MICRO, key, B, T, mesh, engine="mega", temperature=temp,
        )
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=label)


def test_model_sharded_tp_turbo_shares_the_path():
    """turbo under a model axis rides the same ar_tp step (its in-kernel
    finale cannot host the psum either); classes == single-device turbo ==
    single-device mega for the tested horizon."""
    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(12)
    ref = np.asarray(generate_classes(
        params, MICRO, jax.random.fold_in(key, 0), B, T,
        temperature=1.0, engine="turbo",
    ))
    out = model_sharded_generate_classes(
        params, MICRO, key, B, T, make_mesh(1, 8), engine="turbo",
        temperature=1.0,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_model_sharded_tp_mega_composes_with_data_axis():
    """data x model mesh on the TP-mega path: each data shard's lanes equal
    a single-device mega run of that shard with the folded key."""
    from lb_wavenet_tpu.parallel.synthesis import mesh_generate_classes

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(13)
    out = np.asarray(mesh_generate_classes(
        params, MICRO, key, B, T, make_mesh(2, 4), engine="mega",
        temperature=1.0,
    ))
    half = B // 2
    for i in range(2):
        ref = np.asarray(generate_classes(
            params, MICRO, jax.random.fold_in(key, i), half, T,
            temperature=1.0, engine="mega",
        ))
        np.testing.assert_array_equal(out[i * half : (i + 1) * half], ref)


def test_model_sharded_tp_mega_forced_and_cond():
    """Priming (`forced`) and speaker conditioning ride the TP-mega path."""
    import dataclasses

    arch = dataclasses.replace(MICRO, n_speakers=3)
    params = init_params(jax.random.key(0), arch)
    key = jax.random.key(14)
    forced = np.full((B, T), -1, np.int32)
    forced[:, : T // 3] = (
        np.arange(B)[:, None] * 5 + np.arange(T // 3)[None, :]
    ) % 256
    spk = np.arange(B, dtype=np.int32) % 3
    ref = np.asarray(generate_classes(
        params, arch, jax.random.fold_in(key, 0), B, T,
        forced=jnp.asarray(forced), speaker_ids=jnp.asarray(spk),
        temperature=0.0, engine="mega",
    ))
    out = model_sharded_generate_classes(
        params, arch, key, B, T, make_mesh(1, 8), engine="mega",
        forced=forced, speaker_ids=spk, temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_skip_split_guardrails():
    """ADVICE r3: clear errors for a non-dividing skip split and for
    return_logits under model sharding (instead of opaque shard_map
    failures)."""
    import dataclasses

    import pytest as _pytest

    arch12 = dataclasses.replace(MICRO, skip_channels=12)
    params12 = init_params(jax.random.key(0), arch12)
    with _pytest.raises(ValueError, match="skip_channels"):
        model_sharded_generate_classes(
            params12, arch12, jax.random.key(0), B, T, make_mesh(1, 8),
            engine="pallas",
        )
    params = init_params(jax.random.key(0), MICRO)
    with _pytest.raises(ValueError, match="return_logits"):
        model_sharded_generate_classes(
            params, MICRO, jax.random.key(0), B, T, make_mesh(1, 8),
            engine="pallas", return_logits=True,
        )


def test_model_sharded_pallas_kernel_speed_path():
    """r3 (VERDICT r2 item 5 follow-through): model sharding at KERNEL
    speed — the pallas engine under shard_map with the skip-separable
    split (w_skip/b_skip sliced on S, post.w1 on its contraction rows)
    and ONE psum per step at the post hidden. Greedy and sampled output
    equal the single-device pallas run (fold_in RNG contract, like the
    fused fleet)."""
    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(5)
    mesh = make_mesh(1, 8)  # pure model axis: skip 8 -> 1 channel/shard
    for temp, label in ((0.0, "greedy"), (1.0, "sampled")):
        ref = np.asarray(generate_classes(
            params, MICRO, jax.random.fold_in(key, 0), B, T,
            temperature=temp, engine="pallas",
        ))
        out = model_sharded_generate_classes(
            params, MICRO, key, B, T, mesh, engine="pallas",
            temperature=temp,
        )
        np.testing.assert_array_equal(np.asarray(out), ref, err_msg=label)


def test_model_sharded_pallas_composes_with_data_axis():
    """data x model mesh on the skip-split path: each data shard's lanes
    equal a single-device run of that shard with the folded key."""
    from lb_wavenet_tpu.parallel.synthesis import mesh_generate_classes

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(6)
    mesh = make_mesh(2, 4)
    out = np.asarray(mesh_generate_classes(
        params, MICRO, key, B, T, mesh, engine="pallas", temperature=1.0,
    ))
    half = B // 2
    for i in range(2):
        ref = np.asarray(generate_classes(
            params, MICRO, jax.random.fold_in(key, i), half, T,
            temperature=1.0, engine="pallas",
        ))
        np.testing.assert_array_equal(out[i * half : (i + 1) * half], ref)


def test_model_sharded_xla_engine_with_explicit_axis_matches():
    """The per-step-psum formulation is engine-symmetric: the xla engine
    through the same shard_map path (model_axis threading in stack_step)
    also equals its single-device run."""
    from lb_wavenet_tpu.parallel.synthesis import _skip_sharded_generate

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(7)
    ref = np.asarray(generate_classes(
        params, MICRO, jax.random.fold_in(key, 0), B, T,
        temperature=0.0, engine="xla",
    ))
    out = _skip_sharded_generate(
        params, MICRO, key, B, T, make_mesh(1, 8), "xla",
        None, None, None, 0.0,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_streaming_bit_matches_sharded_one_shot():
    """r4 (VERDICT r3 item 5): model-sharded STREAMING — chunked emission
    under the skip-split shard_map session equals the sharded one-shot
    path exactly (ring phase + per-lane hash continue on absolute time),
    for both the TP fused step (mega) and the pallas engine."""
    from lb_wavenet_tpu.parallel.synthesis import ShardedSession

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(21)
    mesh = make_mesh(2, 4)
    chunk = T // 3
    for engine in ("mega", "pallas"):
        one = np.asarray(model_sharded_generate_classes(
            params, MICRO, key, B, T, mesh, engine=engine, temperature=1.0,
        ))
        sess = ShardedSession(params, MICRO, B, key, mesh, engine=engine)
        parts = [
            np.asarray(sess.chunk(chunk, temperature=1.0)) for _ in range(3)
        ]
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), one, err_msg=engine
        )
        assert sess.t == T


def test_sharded_session_reset_lane_equals_fresh_session():
    """Continuous batching under model sharding: a recycled lane's greedy
    output bit-matches a fresh sharded session (the reset_lanes contract,
    now on the TP stream state)."""
    from lb_wavenet_tpu.parallel.synthesis import ShardedSession

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(22)
    mesh = make_mesh(2, 4)
    sess = ShardedSession(params, MICRO, B, key, mesh, engine="mega")
    sess.chunk(T, temperature=0.0)              # free-run everything
    mask = np.zeros(B, bool)
    mask[3] = True
    sess.reset_lanes(mask)
    recycled = np.asarray(sess.chunk(T, temperature=0.0))[3]
    fresh = ShardedSession(params, MICRO, B, key, mesh, engine="mega")
    fresh_out = np.asarray(fresh.chunk(T, temperature=0.0))[3]
    np.testing.assert_array_equal(recycled, fresh_out)


def test_model_sharded_tp_mega_mel_conditioned():
    """Mel conditioning rides the TP-mega path: the upsampled cond stream
    shards over `data` and feeds the TP step's in-XLA fold exactly like
    the single-device fused path."""
    import dataclasses

    arch = dataclasses.replace(
        MICRO, n_mels=4, cond_channels=8, upsample_factors=(2, 2)
    )
    params = init_params(jax.random.key(0), arch)
    key = jax.random.key(15)
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    frames = jax.random.normal(
        jax.random.key(16), (B, T // 4 + 2, arch.n_mels)
    )
    cond = upsample_cond(
        params["upsampler"], arch, frames, jnp.dtype(arch.compute_dtype)
    )
    ref = np.asarray(generate_classes(
        params, arch, jax.random.fold_in(key, 0), B, T, cond=cond,
        temperature=1.0, engine="mega",
    ))
    out = model_sharded_generate_classes(
        params, arch, key, B, T, make_mesh(1, 8), engine="mega",
        cond=np.asarray(cond), temperature=1.0,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_one_shot_mesh_programs_are_cached():
    """r4: repeated one-shot mesh synthesis calls reuse ONE compiled
    program per static configuration instead of rebuilding the
    jit(shard_map) closure (which retraced on every call — the tp_floor
    measurement artifact)."""
    from lb_wavenet_tpu.parallel import synthesis as S

    S._PROGRAM_CACHE.clear()
    params = init_params(jax.random.key(0), MICRO)
    mesh = make_mesh(2, 4)
    a = np.asarray(model_sharded_generate_classes(
        params, MICRO, jax.random.key(40), B, T, mesh, engine="mega",
        temperature=1.0,
    ))
    assert len(S._PROGRAM_CACHE) == 1
    b = np.asarray(model_sharded_generate_classes(
        params, MICRO, jax.random.key(40), B, T, mesh, engine="mega",
        temperature=1.0,
    ))
    assert len(S._PROGRAM_CACHE) == 1      # second call reused the program
    np.testing.assert_array_equal(a, b)
    # A different static config gets its own entry.
    model_sharded_generate_classes(
        params, MICRO, jax.random.key(40), B, T, mesh, engine="pallas",
        temperature=1.0,
    )
    assert len(S._PROGRAM_CACHE) == 2


def test_sharded_streaming_mel_conditioned():
    """Mel conditioning through the sharded STREAMING session: per-chunk
    cond slices ride the data axis; chunked output == the sharded one-shot
    mel run."""
    import dataclasses

    from lb_wavenet_tpu.models.conditioning import upsample_cond
    from lb_wavenet_tpu.parallel.synthesis import ShardedSession

    arch = dataclasses.replace(
        MICRO, n_mels=4, cond_channels=8, upsample_factors=(2, 2)
    )
    params = init_params(jax.random.key(0), arch)
    key = jax.random.key(41)
    frames = jax.random.normal(
        jax.random.key(42), (B, T // 4 + 2, arch.n_mels)
    )
    cond = np.asarray(upsample_cond(
        params["upsampler"], arch, frames, jnp.dtype(arch.compute_dtype)
    ))
    mesh = make_mesh(2, 4)
    one = np.asarray(model_sharded_generate_classes(
        params, arch, key, B, T, mesh, engine="mega", cond=cond,
        temperature=1.0,
    ))
    sess = ShardedSession(params, arch, B, key, mesh, engine="mega")
    chunk = T // 3
    parts = [
        np.asarray(sess.chunk(
            chunk, cond=cond[:, i * chunk : (i + 1) * chunk],
            temperature=1.0,
        ))
        for i in range(3)
    ]
    np.testing.assert_array_equal(np.concatenate(parts, axis=1), one)


def test_sharded_streaming_turbo_engine():
    """turbo ShardedSession rides the same TP stream state as mega:
    chunked == sharded one-shot (completes the sharded-streaming engine
    matrix: mega/pallas covered above)."""
    from lb_wavenet_tpu.parallel.synthesis import ShardedSession

    params = init_params(jax.random.key(0), MICRO)
    key = jax.random.key(51)
    mesh = make_mesh(2, 4)
    one = np.asarray(model_sharded_generate_classes(
        params, MICRO, key, B, T, mesh, engine="turbo", temperature=1.0,
    ))
    sess = ShardedSession(params, MICRO, B, key, mesh, engine="turbo")
    parts = [
        np.asarray(sess.chunk(T // 2, temperature=1.0)),
        np.asarray(sess.chunk(T - T // 2, temperature=1.0)),
    ]
    np.testing.assert_array_equal(np.concatenate(parts, axis=1), one)
