"""Continuous batching: lane recycling in streaming sessions.

Serving invariants of generate.reset_lanes (no reference counterpart —
build-side serving tier, SURVEY.md §2.3 fleet synthesis):

  * a RECYCLED lane's subsequent greedy output is bit-identical to a fresh
    session started at t=0 (zeroed ring columns == t=0 context at any
    global ring phase);
  * KEPT lanes are bit-identical to an uninterrupted session;
  * an all-False mask is the identity;
  * the xla and pallas engines still bit-match each other after resets
    (they share the sampling chain).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import reset_lanes, start_stream, stream_chunk
from lb_wavenet_tpu.models.wavenet import init_params

ARCH = ArchConfig(
    n_blocks=2, n_layers_per_block=3, residual_channels=16,
    skip_channels=16, gate_channels=16, compute_dtype="float32",
)
B, CHUNK = 4, 16
ENGINES = ["xla", "pallas", "turbo", "mega"]


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), ARCH)


def _run(params, engine, n_chunks, forced_chunks=None, reset_after=None,
         temperature=0.0, rng_seed=1):
    """Drive a session; returns (B, n_chunks*CHUNK) classes."""
    stream = start_stream(
        ARCH, B, jax.random.key(rng_seed), engine=engine, params=params
    )
    outs = []
    for i in range(n_chunks):
        forced = None
        if forced_chunks is not None and i < len(forced_chunks):
            forced = forced_chunks[i]
        classes, stream = stream_chunk(
            params, ARCH, stream, CHUNK, forced=forced,
            temperature=temperature, engine=engine,
        )
        outs.append(np.asarray(classes))
        if reset_after is not None and i == reset_after[0]:
            stream = reset_lanes(
                params, ARCH, stream, jnp.asarray(reset_after[1]),
                engine=engine,
            )
    return np.concatenate(outs, axis=1)


def _forced_prefix(n_chunks=2, seed=7):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.integers(0, ARCH.quant_channels, (B, CHUNK)),
                    dtype=jnp.int32)
        for _ in range(n_chunks)
    ]


@pytest.mark.parametrize("engine", ENGINES)
def test_recycled_lane_equals_fresh_session(params, engine):
    """Teacher-force 2 distinct chunks per lane, recycle lanes 1 and 3,
    free-run greedy: recycled lanes must emit exactly what a fresh session
    emits, kept lanes exactly what an uninterrupted session emits."""
    forced = _forced_prefix()
    mask = np.array([False, True, False, True])

    out = _run(params, engine, 4, forced_chunks=forced,
               reset_after=(1, mask))
    control = _run(params, engine, 4, forced_chunks=forced)          # no reset
    fresh = _run(params, engine, 2)                                  # t=0 run

    post = out[:, 2 * CHUNK:]
    # Recycled lanes reproduce a fresh session's first 2 chunks (all fresh
    # lanes are identical — same zero-context greedy sequence).
    np.testing.assert_array_equal(post[1], fresh[1], err_msg=engine)
    np.testing.assert_array_equal(post[3], fresh[3], err_msg=engine)
    # Kept lanes are untouched by the neighbors' reset.
    np.testing.assert_array_equal(post[0], control[:, 2 * CHUNK:][0])
    np.testing.assert_array_equal(post[2], control[:, 2 * CHUNK:][2])
    # The forced prefix makes lanes genuinely distinct, so the recycled
    # lanes' histories really were erased (not a no-op test).
    assert not np.array_equal(control[:, 2 * CHUNK:][1], fresh[1])


@pytest.mark.parametrize("engine", ENGINES)
def test_all_false_mask_is_identity(params, engine):
    forced = _forced_prefix(1)
    mask = np.zeros(B, bool)
    out = _run(params, engine, 3, forced_chunks=forced,
               reset_after=(0, mask))
    control = _run(params, engine, 3, forced_chunks=forced)
    np.testing.assert_array_equal(out, control, err_msg=engine)


def test_xla_pallas_bitmatch_after_reset(params):
    """Sampled mode: both engines consume the same RNG chain, so their
    sequences stay bit-identical through a mid-session reset."""
    forced = _forced_prefix(1)
    mask = np.array([True, False, True, False])
    seqs = {
        e: _run(params, e, 3, forced_chunks=forced, reset_after=(0, mask),
                temperature=1.0, rng_seed=5)
        for e in ("xla", "pallas")
    }
    np.testing.assert_array_equal(seqs["xla"], seqs["pallas"])


def test_reset_then_prime_new_request(params):
    """The recycled lane can immediately serve a primed request: teacher
    forcing right after the reset behaves as from t=0 (xla engine)."""
    prime = _forced_prefix(1, seed=11)[0]
    mask = np.array([False, False, True, False])

    # Session A: noise prefix, reset lane 2, then prime it with `prime`.
    out = _run(params, "xla", 3,
               forced_chunks=[_forced_prefix(1, seed=3)[0], prime],
               reset_after=(0, mask))
    # Session B: fresh stream primed with the same chunk from t=0.
    fresh = _run(params, "xla", 2, forced_chunks=[prime])
    np.testing.assert_array_equal(out[2, CHUNK:], fresh[2])


def test_per_lane_rng_sampled_reproducibility(params):
    """VERDICT r1 item 7 + r2 item 3: per-lane counter-based RNG — a pooled
    request's SAMPLED stream bit-matches a dedicated session opened with
    the same seed, including requests on RECYCLED lanes, for the xla, mega
    AND turbo engines (the hash depends only on (seed, lane-local t,
    class): batch width, lane position, and platform PRNG drop out)."""
    from lb_wavenet_tpu.serving import SessionPool

    arch = ARCH
    CH = 16

    def dedicated(engine, seed, n):
        stream = start_stream(arch, 1, jax.random.key(77), engine=engine,
                              params=params)
        outs, t = [], 0
        while t < n:
            cls, stream = stream_chunk(
                params, arch, stream, CH, temperature=1.0, engine=engine,
                lane_seed=jnp.asarray([seed], jnp.int32),
                lane_t0=jnp.zeros(1, jnp.int32),
            )
            outs.append(np.asarray(cls)[0])
            t += CH
        return np.concatenate(outs)[:n]

    for engine in ("xla", "mega", "turbo"):
        pool = SessionPool(params, arch, batch=2, rng=jax.random.key(1),
                           engine=engine, chunk_size=CH, temperature=1.0,
                           per_lane_rng=True)
        assert pool.submit("a", n_samples=3 * CH, seed=111)
        assert pool.submit("b", n_samples=CH + 5, seed=222)
        got = {}
        submitted_c = False
        for _ in range(60):
            if not pool.active and submitted_c:
                break
            for rid, (cls, fin) in pool.step().items():
                got.setdefault(rid, []).append(cls)
            if not submitted_c and pool.free_lanes() > 0:
                # Recycled lane, mid-session (nonzero lane_t0).
                submitted_c = pool.submit("c", n_samples=2 * CH, seed=333)
        assert not pool.active and submitted_c
        out = {rid: np.concatenate(v) for rid, v in got.items()}
        for rid, seed, n in [("a", 111, 3 * CH), ("b", 222, CH + 5),
                             ("c", 333, 2 * CH)]:
            assert len(out[rid]) == n, (engine, rid)
            np.testing.assert_array_equal(
                out[rid], dedicated(engine, seed, n),
                err_msg=f"{engine}:{rid}",
            )
    # Cross-engine: same hash + fp32 logits -> identical sampled streams.
    xla_999 = dedicated("xla", 999, 2 * CH)
    np.testing.assert_array_equal(xla_999, dedicated("mega", 999, 2 * CH))
    np.testing.assert_array_equal(xla_999, dedicated("turbo", 999, 2 * CH))


def test_per_lane_rng_streams_differ_by_seed(params):
    """Different per-lane seeds give different sampled streams (sanity that
    the hash actually injects noise) and identical seeds reproduce."""
    lane_kw = dict(
        lane_seed=jnp.asarray([5, 6], jnp.int32),
        lane_t0=jnp.zeros(2, jnp.int32),
    )
    stream = start_stream(ARCH, 2, jax.random.key(3), engine="xla",
                          params=params)
    cls, _ = stream_chunk(
        params, ARCH, stream, 64, temperature=1.0, engine="xla", **lane_kw
    )
    cls = np.asarray(cls)
    assert (cls[0] != cls[1]).any()
    stream2 = start_stream(ARCH, 2, jax.random.key(99), engine="xla",
                           params=params)
    cls2, _ = stream_chunk(
        params, ARCH, stream2, 64, temperature=1.0, engine="xla", **lane_kw
    )
    np.testing.assert_array_equal(cls, np.asarray(cls2))  # rng key drops out
