"""Per-request (per-lane) temperature (VERDICT r4 item 4).

Contract: a pooled request served at temperature tau — via
SessionPool.submit(temperature=tau) or the streaming primitives'
`lane_inv_temp` — is BIT-IDENTICAL to a dedicated session created with
static temperature=tau and the same per-lane seed, on every engine
(xla / pallas / turbo / mega) and on the model-sharded TP pool. Greedy
(tau=0) requests on a sampled pool bit-match dedicated greedy sessions.
The mechanism: each lane scores logits * inv + gumbel with a HOST-computed
float32(1.0 / tau) (== the dedicated kernel's folded constant), inv == 0
selecting the raw-logits argmax.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import start_stream, stream_chunk
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.serving import SessionPool

ARCH = ArchConfig(
    n_blocks=2, n_layers_per_block=3, residual_channels=16,
    skip_channels=16, gate_channels=16, compute_dtype="float32",
)
CHUNK = 16
TAUS = [0.7, 0.0, 1.3, 1.0]  # one greedy lane among sampled ones


def _inv(tau: float) -> np.float32:
    return np.float32(1.0 / tau) if tau > 0 else np.float32(0.0)


def _dedicated(params, engine, tau, seed, n):
    """Single-lane dedicated session at STATIC temperature tau."""
    stream = start_stream(ARCH, 1, jax.random.key(5), engine=engine,
                          params=params)
    outs, t = [], 0
    while t < n:
        kw = {}
        if tau > 0:
            kw = dict(lane_seed=jnp.asarray([seed], jnp.int32),
                      lane_t0=jnp.zeros((1,), jnp.int32))
        classes, stream = stream_chunk(
            params, ARCH, stream, CHUNK, temperature=tau, engine=engine,
            **kw,
        )
        outs.append(np.asarray(classes)[0])
        t += CHUNK
    return np.concatenate(outs)[:n]


@pytest.mark.parametrize("engine", ["xla", "pallas", "turbo", "mega"])
def test_lane_inv_temp_matches_dedicated_static_tau(engine, monkeypatch):
    """Streaming primitives: one batched session with per-lane inverse
    temperatures == four dedicated sessions at their static taus."""
    if engine == "mega":
        monkeypatch.setenv("WAVENET_MEGA_PAD_TEST", "1")
    params = init_params(jax.random.key(0), ARCH)
    b = len(TAUS)
    seeds = np.asarray([101, 202, 303, 404], np.int32)
    n = 3 * CHUNK

    stream = start_stream(ARCH, b, jax.random.key(5), engine=engine,
                          params=params)
    outs, t = [], 0
    while t < n:
        classes, stream = stream_chunk(
            params, ARCH, stream, CHUNK, temperature=1.0, engine=engine,
            lane_seed=jnp.asarray(seeds),
            lane_t0=jnp.zeros((b,), jnp.int32),
            lane_inv_temp=jnp.asarray([_inv(tau) for tau in TAUS]),
        )
        outs.append(np.asarray(classes))
        t += CHUNK
    batched = np.concatenate(outs, axis=1)[:, :n]

    for lane, tau in enumerate(TAUS):
        ded = _dedicated(params, engine, tau, int(seeds[lane]), n)
        np.testing.assert_array_equal(
            batched[lane], ded,
            err_msg=f"{engine} lane {lane} tau={tau}",
        )


def test_lane_inv_temp_validation():
    params = init_params(jax.random.key(0), ARCH)
    stream = start_stream(ARCH, 2, jax.random.key(1), engine="xla",
                          params=params)
    inv = jnp.asarray([_inv(0.7), _inv(1.0)])
    with pytest.raises(ValueError, match="sampled session"):
        stream_chunk(params, ARCH, stream, CHUNK, temperature=0.0,
                     engine="xla", lane_inv_temp=inv)
    with pytest.raises(ValueError, match="global_rng"):
        stream_chunk(params, ARCH, stream, CHUNK, temperature=1.0,
                     engine="xla", global_rng=True, lane_inv_temp=inv)
    with pytest.raises(ValueError, match="lane_seed"):
        stream_chunk(params, ARCH, stream, CHUNK, temperature=1.0,
                     engine="xla", lane_inv_temp=inv)


@pytest.mark.parametrize("engine", ["xla", "turbo"])
def test_pool_per_request_temperature_matches_dedicated(engine):
    """SessionPool.submit(temperature=...): mixed-temperature requests —
    including one greedy and one on a RECYCLED lane — each bit-match a
    dedicated session at that static tau with the request's seed."""
    params = init_params(jax.random.key(0), ARCH)
    pool = SessionPool(params, ARCH, batch=2, rng=jax.random.key(7),
                       engine=engine, chunk_size=CHUNK, temperature=1.0)
    reqs = [("a", 0.7, 11, 2 * CHUNK), ("b", 0.0, 22, 3 * CHUNK),
            ("c", 1.3, 33, 2 * CHUNK)]  # "c" lands on a recycled lane
    submitted, got = 0, {}
    while submitted < len(reqs) or pool.active:
        while submitted < len(reqs):
            rid, tau, seed, n = reqs[submitted]
            if not pool.submit(rid, n, seed=seed, temperature=tau):
                break
            submitted += 1
        for rid, (classes, done) in pool.step().items():
            got.setdefault(rid, []).append(classes)
    for rid, tau, seed, n in reqs:
        out = np.concatenate(got[rid])
        assert out.shape == (n,)
        ded = _dedicated(params, engine, tau, seed, n)
        np.testing.assert_array_equal(out, ded, err_msg=f"{rid} tau={tau}")


def test_pool_temperature_validation():
    params = init_params(jax.random.key(0), ARCH)
    pool = SessionPool(params, ARCH, batch=1, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)
    with pytest.raises(ValueError, match="SAMPLED pool"):
        pool.submit("r", 8, temperature=0.7)
    pool2 = SessionPool(params, ARCH, batch=1, rng=jax.random.key(1),
                        engine="xla", chunk_size=CHUNK, temperature=1.0,
                        per_lane_rng=False)
    with pytest.raises(ValueError, match="per_lane_rng"):
        pool2.submit("r", 8, temperature=0.7)
    pool3 = SessionPool(params, ARCH, batch=1, rng=jax.random.key(1),
                        engine="xla", chunk_size=CHUNK, temperature=1.0)
    with pytest.raises(ValueError, match=">= 0"):
        pool3.submit("r", 8, temperature=-1.0)


def test_mesh_pool_per_request_temperature():
    """The TP (model-sharded) pool serves per-request temperatures too:
    same contract as the single-chip pools, through ShardedSession and the
    ar_tp per-step path."""
    from lb_wavenet_tpu.parallel.mesh import make_mesh

    params = init_params(jax.random.key(0), ARCH)
    mesh = make_mesh(1, 2)  # skip_channels 16 % 2 == 0
    pool = SessionPool(params, ARCH, batch=2, rng=jax.random.key(7),
                       engine="mega", chunk_size=CHUNK, temperature=1.0,
                       mesh=mesh)
    reqs = [("a", 0.7, 11, 2 * CHUNK), ("b", 0.0, 22, 2 * CHUNK)]
    for rid, tau, seed, n in reqs:
        assert pool.submit(rid, n, seed=seed, temperature=tau)
    got = {}
    while pool.active:
        for rid, (classes, done) in pool.step().items():
            got.setdefault(rid, []).append(classes)
    for rid, tau, seed, n in reqs:
        out = np.concatenate(got[rid])
        # Dedicated single-chip reference: TP pools' classes equal the
        # single-device mega/turbo class stream (the r4 TP contract), which
        # shares the per-lane hash with every other engine at the same
        # seed; use the turbo dedicated session as the oracle.
        ded = _dedicated(params, "turbo", tau, seed, n)
        np.testing.assert_array_equal(out, ded, err_msg=f"{rid} tau={tau}")
