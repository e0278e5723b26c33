"""Online HTTP serving daemon (server.py, r5).

Contract: POST /synthesize requests served through the PoolServer's
continuous-batching worker are bit-identical to dedicated sessions with
the same seed/temperature (the SessionPool replay contract riding over
HTTP), concurrent requests batch into shared device steps, wav responses
are valid 16-bit PCM of the LUT-decoded classes, and argument errors come
back as HTTP 400s instead of killing the stepping thread.
"""
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import start_stream, stream_chunk
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.server import PoolServer, make_http_server
from lb_wavenet_tpu.serving import SessionPool

ARCH = ArchConfig(
    n_blocks=2, n_layers_per_block=3, residual_channels=16,
    skip_channels=16, gate_channels=16, compute_dtype="float32",
)
CHUNK = 16


def _dedicated(params, tau, seed, n):
    stream = start_stream(ARCH, 1, jax.random.key(5), engine="xla",
                          params=params)
    outs, t = [], 0
    while t < n:
        kw = {}
        if tau > 0:
            kw = dict(lane_seed=jnp.asarray([seed], jnp.int32),
                      lane_t0=jnp.zeros((1,), jnp.int32))
        classes, stream = stream_chunk(
            params, ARCH, stream, CHUNK, temperature=tau, engine="xla",
            **kw,
        )
        outs.append(np.asarray(classes)[0])
        t += CHUNK
    return np.concatenate(outs)[:n]


def _serve(params, batch=3):
    pool = SessionPool(
        params, ARCH, batch, jax.random.key(0), engine="xla",
        chunk_size=CHUNK, temperature=1.0, pipeline=True,
    )
    ps = PoolServer(pool)
    ps.start()
    httpd = make_http_server(ps, ARCH, port=0, request_timeout=120.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address
    return ps, httpd, f"http://{host}:{port}"


def _post(url, payload, raw=False):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = r.read()
        return body if raw else json.loads(body)


def test_http_requests_bit_match_dedicated_sessions():
    """Three CONCURRENT requests (mixed temperature incl. greedy) batch
    through one pool; each == its dedicated session, bit-exact."""
    params = init_params(jax.random.key(0), ARCH)
    ps, httpd, url = _serve(params)
    try:
        n = 3 * CHUNK
        specs = [
            {"n_samples": n, "seed": 101, "format": "classes"},
            {"n_samples": n - 5, "seed": 202, "temperature": 0.7,
             "format": "classes"},
            {"n_samples": n, "temperature": 0.0, "format": "classes"},
        ]
        out = [None] * len(specs)

        def go(i):
            out[i] = _post(url, specs[i])

        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(len(specs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        for i, spec in enumerate(specs):
            assert out[i] is not None, f"request {i} did not complete"
            got = np.asarray(out[i]["classes"], np.int32)
            assert got.shape == (spec["n_samples"],)
            tau = spec.get("temperature", 1.0)
            if tau > 0:
                ded = _dedicated(params, tau, spec["seed"], spec["n_samples"])
                np.testing.assert_array_equal(got, ded)
        # Greedy request: replay against a dedicated greedy session.
        ded0 = _dedicated(params, 0.0, 0, specs[2]["n_samples"])
        np.testing.assert_array_equal(
            np.asarray(out[2]["classes"], np.int32), ded0
        )
        # Concurrency actually shared steps: 3 requests of <= 3 chunks
        # each through a 3-lane pool must take far fewer than the ~11
        # steps of serial service (worst case: one early solo burst of
        # 3+1 pipelined steps, then the other two batched: 3+1 more).
        assert ps.pool.stats["steps"] <= 8
    finally:
        httpd.shutdown()
        httpd.server_close()
        ps.stop()


def test_http_wav_healthz_and_errors():
    params = init_params(jax.random.key(0), ARCH)
    ps, httpd, url = _serve(params, batch=2)
    try:
        n = CHUNK + 3
        body = _post(url, {"n_samples": n, "seed": 7}, raw=True)
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        # 16-bit PCM payload of exactly n samples after the 44-byte header.
        assert len(body) == 44 + 2 * n
        # The PCM == the LUT-decoded classes of the same request replayed.
        classes = np.asarray(
            _post(url, {"n_samples": n, "seed": 7, "format": "classes"}
                  )["classes"], np.int32)
        from lb_wavenet_tpu.ops.mulaw import mu_law_decode
        lut = np.asarray(
            mu_law_decode(jnp.arange(ARCH.quant_channels),
                          ARCH.quant_channels), np.float32)
        want = (np.clip(lut[classes], -1, 1) * 32767.0).astype(np.int16)
        got = np.frombuffer(body[44:], np.int16)
        np.testing.assert_array_equal(got, want)

        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"] and h["free_lanes"] == 2 and h["steps"] >= 1

        # Errors surface as 400s and do NOT kill the worker.
        for bad in ({"n_samples": -4}, {"n_samples": 8, "mel_path": "x"},
                    {}):
            try:
                _post(url, bad)
                raise AssertionError(f"{bad} should have failed")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        # Worker still serves after the errors.
        ok = _post(url, {"n_samples": 5, "seed": 1, "format": "classes"})
        assert len(ok["classes"]) == 5
    finally:
        httpd.shutdown()
        httpd.server_close()
        ps.stop()


def test_http_mel_conditioned_daemon():
    """Mel archs over HTTP: `mel_path` routes through the injected
    cond_builder; output == a dedicated conditioned session."""
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_mels=6, cond_channels=4,
        upsample_factors=(2, 4), compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    n = 2 * CHUNK
    rng = np.random.default_rng(3)
    cond_full = rng.standard_normal((n, arch.cond_channels)).astype(
        np.float32)

    def cond_builder(mel_path, n_samples):
        assert mel_path == "synthetic.npy"

        def cond_fn(t_local, m):
            return cond_full[t_local:t_local + m]
        return cond_fn

    pool = SessionPool(params, arch, 2, jax.random.key(0), engine="xla",
                       chunk_size=CHUNK, temperature=1.0, pipeline=True)
    ps = PoolServer(pool)
    ps.start()
    httpd = make_http_server(ps, arch, port=0, cond_builder=cond_builder,
                             request_timeout=120.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address
    url = f"http://{host}:{port}"
    try:
        out = _post(url, {"n_samples": n, "seed": 77,
                          "mel_path": "synthetic.npy",
                          "format": "classes"})
        got = np.asarray(out["classes"], np.int32)

        # Dedicated conditioned session, same seed.
        stream = start_stream(arch, 1, jax.random.key(5), engine="xla",
                              params=params)
        outs = []
        for k in range(n // CHUNK):
            classes, stream = stream_chunk(
                params, arch, stream, CHUNK,
                cond=jnp.asarray(cond_full[None, k * CHUNK:(k + 1) * CHUNK]),
                temperature=1.0, engine="xla",
                lane_seed=jnp.asarray([77], jnp.int32),
                lane_t0=jnp.zeros((1,), jnp.int32),
            )
            outs.append(np.asarray(classes)[0])
        np.testing.assert_array_equal(got, np.concatenate(outs))

        # Missing mel_path on a mel arch -> 400.
        try:
            _post(url, {"n_samples": 8})
            raise AssertionError("should have failed")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
        ps.stop()


def test_daemon_thread_hygiene_sequential_requests():
    """200 sequential HTTP requests do not leak handler threads and the
    worker parks when idle (daemon soak, thread-count bounded)."""
    params = init_params(jax.random.key(0), ARCH)
    ps, httpd, url = _serve(params, batch=2)
    try:
        for i in range(200):
            out = _post(url, {"n_samples": 5, "seed": i,
                              "format": "classes"})
            assert len(out["classes"]) == 5
        # Handler threads are per-connection daemons that exit after the
        # response; allow a small settle margin.
        import time as _t
        _t.sleep(0.5)
        assert threading.active_count() < 20
    finally:
        httpd.shutdown()
        httpd.server_close()
        ps.stop()
