"""SessionPool: continuous-batching serving loop invariants.

Pins the host bookkeeping (lb_wavenet_tpu/serving.py) to the device
primitives it composes: under greedy decoding every pooled request's
output is bit-identical to a dedicated single-session run with the same
speaker/conditioning — including requests served on RECYCLED lanes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import start_stream, stream_chunk
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.serving import SessionPool

CHUNK = 16


def _drain(pool, want, got=None):
    """Run the pool until the `want` ids are done. Accumulates EVERY
    request's chunks into `got` (pass the same dict across drains so
    chunks emitted for still-running requests are not lost); returns
    {rid: concatenated classes} for the finished `want` ids."""
    got = {} if got is None else got
    done = set()
    for _ in range(200):
        for rid, (classes, fin) in pool.step().items():
            got.setdefault(rid, []).append(classes)
            if fin:
                done.add(rid)
        if done >= set(want):
            break
    assert done >= set(want), f"undrained: {set(want) - done}"
    return got, {rid: np.concatenate(got[rid]) for rid in want}


def _dedicated(params, arch, n, speaker=None, cond_full=None):
    """Greedy single-session reference: B=1 xla stream."""
    stream = start_stream(arch, 1, jax.random.key(99), engine="xla",
                          params=params)
    sid = jnp.asarray([speaker], jnp.int32) if speaker is not None else None
    outs, t = [], 0
    while t < n:
        cond = None
        if cond_full is not None:
            cond = cond_full[None, t : t + CHUNK]
        classes, stream = stream_chunk(
            params, arch, stream, CHUNK, cond=cond, speaker_ids=sid,
            temperature=0.0, engine="xla",
        )
        outs.append(np.asarray(classes)[0])
        t += CHUNK
    return np.concatenate(outs)[:n]


def test_pool_matches_dedicated_sessions_with_speakers():
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, n_speakers=4,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(params, arch, batch=2, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)

    # Two initial requests with different speakers and lengths.
    assert pool.submit("a", n_samples=3 * CHUNK, speaker=1)
    assert pool.submit("b", n_samples=CHUNK + 3, speaker=2)
    assert not pool.submit("c", n_samples=CHUNK, speaker=3)  # pool full
    acc, fin = _drain(pool, ["b"])
    out_b = fin["b"]

    # Lane freed -> "c" lands on a RECYCLED lane mid-session.
    assert pool.submit("c", n_samples=2 * CHUNK, speaker=3)
    _, rest = _drain(pool, ["a", "c"], got=acc)

    for rid, n, spk, seq in [
        ("a", 3 * CHUNK, 1, rest["a"]),
        ("b", CHUNK + 3, 2, out_b),
        ("c", 2 * CHUNK, 3, rest["c"]),
    ]:
        ref = _dedicated(params, arch, n, speaker=spk)
        np.testing.assert_array_equal(seq, ref, err_msg=rid)
        assert len(seq) == n

    assert not pool.active and pool.free_lanes() == 2


def test_pool_mel_conditioned_matches_dedicated():
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, n_mels=8, cond_channels=16,
        upsample_factors=(2, 2), compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    # Two requests with distinct deterministic (upsampled) cond streams.
    conds = {
        rid: np.asarray(
            jax.random.normal(jax.random.key(k), (4 * CHUNK, arch.cond_channels)),
            np.float32,
        )
        for rid, k in [("x", 5), ("y", 6)]
    }

    def fn(rid):
        return lambda t0, n: conds[rid][t0 : t0 + n]

    pool = SessionPool(params, arch, batch=2, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)
    assert pool.submit("x", n_samples=2 * CHUNK, cond_fn=fn("x"))
    assert pool.submit("y", n_samples=3 * CHUNK, cond_fn=fn("y"))
    _, got = _drain(pool, ["x", "y"])
    for rid, n in [("x", 2 * CHUNK), ("y", 3 * CHUNK)]:
        cond_full = jnp.asarray(conds[rid])
        ref = _dedicated(params, arch, n, cond_full=cond_full)
        np.testing.assert_array_equal(got[rid], ref, err_msg=rid)


def test_first_lease_on_idle_lane_after_pool_has_stepped():
    """Regression (ADVICE r1, high): a lane NEVER leased before still
    free-runs when the pool steps, so its first lease after any step()
    must reset it — otherwise the request inherits free-run ring history
    and produces silently corrupted audio."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, n_speakers=3,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(params, arch, batch=2, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)
    # Lane 0 leased; lane 1 stays idle while the pool steps 3 chunks.
    assert pool.submit("a", n_samples=3 * CHUNK, speaker=1)
    acc, _ = _drain(pool, ["a"])
    # First-ever lease of lane 1, arriving after the pool has stepped.
    assert pool.submit("late", n_samples=2 * CHUNK, speaker=2)
    _, fin = _drain(pool, ["late"], got=acc)
    ref = _dedicated(params, arch, 2 * CHUNK, speaker=2)
    np.testing.assert_array_equal(fin["late"], ref)


def test_cond_fn_covering_exactly_n_samples_frames():
    """Regression (ADVICE r1, low): a request whose final chunk is partial
    must not ask cond_fn for frames past n_samples — a cond stream covering
    exactly n_samples frames has to work."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, n_mels=8, cond_channels=16,
        upsample_factors=(2, 2), compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    n = CHUNK + 3  # final chunk is partial
    cond_full = np.asarray(
        jax.random.normal(jax.random.key(5), (n, arch.cond_channels)),
        np.float32,
    )

    def exact_cond(t0, m):
        # Slices past n return short arrays -> shape error pre-fix.
        assert t0 + m <= n, f"cond over-read: [{t0}, {t0 + m})"
        return cond_full[t0 : t0 + m]

    pool = SessionPool(params, arch, batch=1, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)
    assert pool.submit("x", n_samples=n, cond_fn=exact_cond)
    _, got = _drain(pool, ["x"])
    # Zero-padded tail cond must match the dedicated session's zero-padded
    # tail too (the request consumes only n samples either way).
    padded = np.zeros((2 * CHUNK, arch.cond_channels), np.float32)
    padded[:n] = cond_full
    ref = _dedicated(params, arch, n, cond_full=jnp.asarray(padded))
    np.testing.assert_array_equal(got["x"], ref)


def test_pool_validation():
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(params, arch, batch=1, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK)
    with pytest.raises(ValueError, match="n_speakers"):
        pool.submit("r", n_samples=8, speaker=1)
    with pytest.raises(ValueError, match="cond_fn"):
        pool.submit("r", n_samples=8, cond_fn=lambda t, n: None)
    with pytest.raises(ValueError, match="positive"):
        pool.submit("r", n_samples=0)


def test_pool_randomized_soak_matches_dedicated():
    """Property test: random lengths and arrival order through a 3-lane
    pool (xla engine, greedy) — EVERY request, wherever and whenever its
    lane was leased, matches a dedicated session bit-exactly."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, n_speakers=3,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    rng = np.random.default_rng(9)
    reqs = [
        (f"r{i}", int(rng.integers(1, 4 * CHUNK)), int(rng.integers(0, 3)))
        for i in range(10)
    ]

    pool = SessionPool(params, arch, batch=3, rng=jax.random.key(1),
                       engine="xla", chunk_size=CHUNK, temperature=0.0)
    got = {}
    queue = list(reqs)
    for _ in range(300):
        while queue and pool.submit(queue[0][0], queue[0][1],
                                    speaker=queue[0][2]):
            queue.pop(0)
        if not pool.active:
            break
        for rid, (classes, done) in pool.step().items():
            got.setdefault(rid, []).append(classes)
    assert not queue and not pool.active

    for rid, n, spk in reqs:
        seq = np.concatenate(got[rid])
        assert len(seq) == n
        ref = _dedicated(params, arch, n, speaker=spk)
        np.testing.assert_array_equal(seq, ref, err_msg=f"{rid} n={n} spk={spk}")


def test_pool_mega_any_batch_auto_pads(monkeypatch):
    """VERDICT r1 item 6: SessionPool(batch=K, engine='mega') works for ANY
    K — the device session auto-pads to the engine lane multiple
    (WAVENET_MEGA_PAD_TEST=4 stands in for TPU's 128 on CPU); pad lanes are
    never leased and greedy request output stays bit-identical to a
    dedicated session."""
    monkeypatch.setenv("WAVENET_MEGA_PAD_TEST", "4")
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(params, arch, batch=3, rng=jax.random.key(1),
                       engine="mega", chunk_size=CHUNK, temperature=0.0)
    assert pool._device_batch == 4  # padded to the lane multiple
    assert pool.free_lanes() == 3   # pad lane not leasable

    assert pool.submit("a", n_samples=2 * CHUNK)
    assert pool.submit("b", n_samples=CHUNK + 5)
    assert pool.submit("c", n_samples=CHUNK)
    assert not pool.submit("d", n_samples=CHUNK)  # capacity is 3, not 4
    acc, fin = _drain(pool, ["a", "b", "c"])
    # Recycled lane mid-session at the padded device batch.
    assert pool.submit("d", n_samples=2 * CHUNK)
    _, rest = _drain(pool, ["d"], got=acc)

    for rid, n, seq in [
        ("a", 2 * CHUNK, fin["a"]),
        ("b", CHUNK + 5, fin["b"]),
        ("c", CHUNK, fin["c"]),
        ("d", 2 * CHUNK, rest["d"]),
    ]:
        ref = _dedicated(params, arch, n)
        np.testing.assert_array_equal(seq, ref, err_msg=rid)
        assert len(seq) == n


def test_pipelined_pool_bit_matches_serial():
    """pipeline=True double-buffers dispatch/delivery (VERDICT r1 item 10):
    the device-side program order is unchanged, so every request's audio is
    bit-identical to the serial pool AND to a dedicated session — including
    requests landing on recycled lanes one dispatch early."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)

    def run(pipeline):
        pool = SessionPool(params, arch, batch=2, rng=jax.random.key(1),
                           engine="xla", chunk_size=CHUNK, temperature=0.0,
                           pipeline=pipeline)
        assert pool.submit("a", n_samples=3 * CHUNK)
        assert pool.submit("b", n_samples=CHUNK + 3)
        got = {}
        submitted_c = False
        for _ in range(200):
            if not pool.active and submitted_c:
                break
            for rid, (cls, fin) in pool.step().items():
                got.setdefault(rid, []).append(cls)
            if not submitted_c and pool.free_lanes() > 0:
                submitted_c = pool.submit("c", n_samples=2 * CHUNK)
        assert not pool.active
        return {rid: np.concatenate(v) for rid, v in got.items()}

    serial = run(False)
    piped = run(True)
    assert set(serial) == set(piped) == {"a", "b", "c"}
    for rid, n in [("a", 3 * CHUNK), ("b", CHUNK + 3), ("c", 2 * CHUNK)]:
        assert len(piped[rid]) == n, rid
        np.testing.assert_array_equal(piped[rid], serial[rid], err_msg=rid)
        np.testing.assert_array_equal(
            piped[rid], _dedicated(params, arch, n), err_msg=rid
        )


def test_mesh_pool_matches_plain_pool():
    """r4 (VERDICT r3 item 5): a MODEL-SHARDED SessionPool (mesh mode,
    skip-split TP sessions under shard_map) delivers bit-identical request
    streams to the plain single-device pool — the per-lane hash makes a
    request's sampled stream depend only on (seed, t_local, class), so the
    two pools' outputs must agree exactly despite different engines
    underneath."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lb_wavenet_tpu.parallel.mesh import make_mesh

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    lengths = [40, 24, 56, 16]

    def run(pool):
        for i, n in enumerate(lengths):
            assert pool.submit(f"r{i}", n, seed=1000 + i)
        _, out = _drain(pool, [f"r{i}" for i in range(len(lengths))])
        return out

    plain = run(SessionPool(
        params, arch, batch=4, rng=jax.random.key(3), engine="mega",
        chunk_size=CHUNK, temperature=1.0,
    ))
    meshed = run(SessionPool(
        params, arch, batch=4, rng=jax.random.key(3), engine="mega",
        chunk_size=CHUNK, temperature=1.0, mesh=make_mesh(2, 4),
    ))
    for rid, ref in plain.items():
        np.testing.assert_array_equal(meshed[rid], ref, err_msg=rid)


def test_mesh_pool_recycles_lanes_and_speakers():
    """Mesh pool continuous batching: more requests than lanes, with
    per-request speakers — greedy output matches dedicated sessions (the
    same contract the plain pool pins)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lb_wavenet_tpu.parallel.mesh import make_mesh

    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
        n_speakers=5,
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(
        params, arch, batch=2, rng=jax.random.key(4), engine="mega",
        chunk_size=CHUNK, temperature=0.0, mesh=make_mesh(2, 4),
    )
    reqs = [("a", 24, 1), ("b", 40, 2), ("c", 16, 3), ("d", 24, 4)]
    pending = list(reqs)
    got: dict = {}
    done = {}
    for _ in range(100):
        while pending and pool.submit(
            pending[0][0], pending[0][1], speaker=pending[0][2]
        ):
            pending.pop(0)
        for rid, (classes, fin) in pool.step().items():
            got.setdefault(rid, []).append(classes)
            if fin:
                done[rid] = np.concatenate(got[rid])
        if len(done) == len(reqs):
            break
    assert len(done) == len(reqs)
    for rid, n, spk in reqs:
        ref = _dedicated(params, arch, n, speaker=spk)
        np.testing.assert_array_equal(done[rid], ref, err_msg=rid)


def test_request_mode_delivery_bit_matches_chunk_mode():
    """r4 (VERDICT r3 item 6): deliver='request' accumulates classes in a
    device-side uint8 time ring and fetches each request ONCE at
    completion — the delivered streams must be bit-identical to chunk-mode
    delivery (same seeds), for both serial and pipelined pools, including
    requests served on recycled lanes (ring wrap + lane reuse)."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=16,
        skip_channels=16, gate_channels=16, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    lengths = [40, 17, 56, 23, 40, 9]  # > 2 lanes -> recycling; odd tails

    def run(**kw):
        pool = SessionPool(
            params, arch, batch=2, rng=jax.random.key(5), engine="mega",
            chunk_size=CHUNK, temperature=1.0, **kw,
        )
        pending = [(f"r{i}", n, 100 + i) for i, n in enumerate(lengths)]
        got: dict = {}
        done = {}
        for _ in range(300):
            while pending and pool.submit(
                pending[0][0], pending[0][1], seed=pending[0][2]
            ):
                pending.pop(0)
            for rid, (classes, fin) in pool.step().items():
                got.setdefault(rid, []).append(classes)
                if fin:
                    done[rid] = np.concatenate(got[rid])
            if len(done) == len(lengths) and not pool.active:
                break
        assert len(done) == len(lengths)
        return done

    ref = run(deliver="chunk")
    # acc ring much shorter than the trace total -> real wrap-around.
    for pipeline in (False, True):
        out = run(deliver="request", acc_samples=CHUNK * 8,
                  pipeline=pipeline)
        for rid, want in ref.items():
            np.testing.assert_array_equal(
                out[rid], want, err_msg=f"{rid} pipeline={pipeline}"
            )
            assert out[rid].dtype == np.int32


def test_request_mode_validation():
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=2, residual_channels=8,
        skip_channels=8, gate_channels=8, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    with pytest.raises(ValueError, match="acc_samples"):
        SessionPool(params, arch, 2, jax.random.key(0), engine="turbo",
                    chunk_size=CHUNK, deliver="request",
                    acc_samples=CHUNK * 8 + 1)
    pool = SessionPool(params, arch, 2, jax.random.key(0), engine="turbo",
                       chunk_size=CHUNK, deliver="request",
                       acc_samples=CHUNK * 4)
    with pytest.raises(ValueError, match="bound n_samples"):
        pool.submit("too-long", CHUNK * 4)  # > cap - 2*chunk
    assert pool.submit("ok", CHUNK * 2)
    # device_batch * acc_samples >= 2^31 would overflow the int32 delivery
    # gather (jnp.take clamps under jit -> silently wrong audio; ADVICE r4).
    with pytest.raises(ValueError, match="2\\^31"):
        SessionPool(params, arch, 2, jax.random.key(0), engine="turbo",
                    chunk_size=CHUNK, deliver="request",
                    acc_samples=2**30)


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def test_pool_soak_500_requests_rss_flat():
    """Long-lived-process hygiene (VERDICT r4 weak #5 / item 7): a pool
    serving 500 mixed requests (varying lengths, seeds, temperatures —
    one compiled trace) holds RSS flat after warmup: no per-request
    leaks in the lease bookkeeping, reset path, or program caches."""
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=2, residual_channels=8,
        skip_channels=8, gate_channels=8, compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    pool = SessionPool(params, arch, batch=4, rng=jax.random.key(1),
                       engine="turbo", chunk_size=CHUNK, temperature=1.0)
    rng = np.random.default_rng(0)
    total, submitted, done = 500, 0, 0
    baseline = None
    while done < total:
        while submitted < total and pool.submit(
            f"r{submitted}",
            int(rng.integers(1, 3 * CHUNK)),
            seed=int(rng.integers(0, 2**31)),
            temperature=float(rng.choice([0.0, 0.7, 1.0, 1.3])),
        ):
            submitted += 1
        for rid, (classes, fin) in pool.step().items():
            if fin:
                done += 1
        if done >= 50 and baseline is None:
            baseline = _rss_kb()  # past warmup/compile allocations
    grown = _rss_kb() - baseline
    assert grown < 20_000, (
        f"RSS grew {grown} KB across ~450 steady-state requests"
    )
    assert done == total
