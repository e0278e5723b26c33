"""Online HTTP serving daemon: a SessionPool behind one stepping thread.

`wavenet serve --listen HOST:PORT` turns the batch request-file server
into an ONLINE service. The reference class of tool has no serving tier
at all (SURVEY.md §3.2 — one Session.run per sample); serving.SessionPool
is the build-side continuous-batching counterpart, and this module is the
thin online front end over it:

  * ONE worker thread owns the pool (SessionPool is not thread-safe):
    it drains a submit queue into free lanes, steps the pool while any
    lane is leased, fans completed chunks out to per-request buffers,
    and parks on a condition variable when idle — an idle daemon costs
    zero device work.
  * HTTP handlers (ThreadingHTTPServer, one thread per connection) only
    enqueue and wait on a per-request Event, so slow clients never stall
    the stepping loop, and many concurrent requests batch into the same
    fixed-shape device step — continuous batching applies to online
    traffic exactly as it does to the offline trace
    (docs/serving.md "Continuous batching").

API (JSON in, wav or JSON out):

  POST /synthesize  {"n_samples": 16000, "seed": 7, "temperature": 0.8,
                     "speaker": 3, "format": "wav"|"classes"}
      -> audio/wav bytes (16-bit PCM at arch.sample_rate), or
         {"classes": [...], "seed": ...} when format == "classes".
      Sampling reproducibility matches the pool contract: a request with
      an explicit seed bit-replays on a dedicated session
      (docs/serving.md "Per-request sampling temperature").
  GET /healthz  -> {"ok": true, "free_lanes": N, "pending": M,
                    "stats": {...per-phase ms...}}

Mel-conditioned archs accept "mel_path": a server-local (F, n_mels) .npy
(the same per-request conditioning contract as the batch-file mode); the
upsampling callback is injected by the CLI so this module stays decoupled
from parameter handling.
"""
from __future__ import annotations

import collections
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from .config import ArchConfig
from .serving import SessionPool


class _Pending:
    """Worker-side state of one in-flight online request."""

    __slots__ = ("rid", "kwargs", "parts", "done", "error", "n_samples")

    def __init__(self, rid: str, n_samples: int, kwargs: dict):
        self.rid = rid
        self.n_samples = n_samples
        self.kwargs = kwargs
        self.parts: list = []
        self.done = threading.Event()
        self.error: Optional[str] = None


class PoolServer:
    """Owns the stepping thread; submit() is safe from any thread."""

    def __init__(self, pool: SessionPool):
        self.pool = pool
        self._lock = threading.Condition()
        self._queue: collections.deque = collections.deque()
        self._stop = False
        self._n_submitted = 0
        self._inflight = 0  # queued + leased, for /healthz
        self._thread = threading.Thread(
            target=self._run, name="wavenet-pool", daemon=True
        )

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        with self._lock:
            self._stop = True
            self._lock.notify()
        self._thread.join(timeout=60)

    def submit(
        self,
        n_samples: int,
        speaker: Optional[int] = None,
        cond_fn: Optional[Callable] = None,
        seed: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> _Pending:
        """Enqueue a request; wait on the returned object's .done Event.

        Argument errors surface on the waiter (`.error`), raised by the
        pool's own submit-time validation on the worker thread."""
        with self._lock:
            self._n_submitted += 1
            rid = f"http-{self._n_submitted}"
            p = _Pending(rid, n_samples, dict(
                speaker=speaker, cond_fn=cond_fn, seed=seed,
                temperature=temperature,
            ))
            self._queue.append(p)
            self._inflight += 1
            self._lock.notify()
        return p

    # -- worker thread --------------------------------------------------

    def _run(self) -> None:
        leased: dict = {}  # rid -> _Pending
        waiting: collections.deque = collections.deque()
        while True:
            with self._lock:
                while (
                    not self._stop
                    and not self._queue
                    and not waiting
                    and not leased
                    and not self.pool.active
                ):
                    self._lock.wait()
                if self._stop:
                    for p in list(waiting) + list(leased.values()):
                        p.error = "server shutting down"
                        p.done.set()
                    return
                while self._queue:
                    waiting.append(self._queue.popleft())
            # Lease as many waiting requests as there are free lanes.
            # A request the pool itself rejects (bad args) errors out its
            # waiter without touching the stepping loop.
            while waiting:
                p = waiting[0]
                try:
                    ok = self.pool.submit(p.rid, p.n_samples, **p.kwargs)
                except Exception as e:  # noqa: BLE001 — surfaced to client
                    waiting.popleft()
                    with self._lock:
                        self._inflight -= 1
                    p.error = str(e)
                    p.done.set()
                    continue
                if not ok:
                    break  # pool full; retry after the next step
                waiting.popleft()
                leased[p.rid] = p
            if leased or self.pool.active:
                for rid, (classes, done) in self.pool.step().items():
                    p = leased.get(rid)
                    if p is None:
                        continue  # pipelined delivery of an errored rid
                    p.parts.append(classes)
                    if done:
                        del leased[rid]
                        with self._lock:
                            self._inflight -= 1
                        p.done.set()

    def healthz(self) -> dict:
        nst = max(self.pool.stats["steps"], 1)
        return {
            "ok": True,
            "free_lanes": self.pool.free_lanes(),
            "pending": self._inflight,
            "engine": self.pool.engine,
            "batch": self.pool.batch,
            "chunk": self.pool.chunk_size,
            "steps": self.pool.stats["steps"],
            "phase_ms_per_step": {
                k[:-2]: round(1000.0 * v / nst, 2)
                for k, v in self.pool.stats.items() if k.endswith("_s")
            },
        }


def make_http_server(
    pool_server: PoolServer,
    arch: ArchConfig,
    host: str = "127.0.0.1",
    port: int = 0,
    cond_builder: Optional[Callable] = None,  # (mel_path, n) -> cond_fn
    request_timeout: float = 600.0,
) -> ThreadingHTTPServer:
    """Build the HTTP front end (call .serve_forever(); port 0 = ephemeral,
    read the bound port from .server_address)."""
    # Decode via a LUT taken FROM the jnp codec (the native-loader pattern,
    # native/__init__.py): bit-exact vs ops.mulaw.mu_law_decode with one
    # device call at startup instead of one per request.
    import jax.numpy as jnp

    from .ops.mulaw import mu_law_decode

    q = arch.quant_channels
    lut = np.asarray(mu_law_decode(jnp.arange(q), q), np.float32)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stdout is for JSONL
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            return self._json(200, pool_server.healthz())

        def do_POST(self):
            if self.path != "/synthesize":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                n_samples = int(req["n_samples"])
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad request: {e}"})
            cond_fn = None
            if arch.use_local_cond:
                if "mel_path" not in req:
                    return self._json(400, {
                        "error": 'mel-conditioned arch: pass "mel_path" '
                        "(server-local (F, n_mels) .npy)"
                    })
                try:
                    cond_fn = cond_builder(str(req["mel_path"]), n_samples)
                except Exception as e:  # noqa: BLE001
                    return self._json(400, {"error": str(e)})
            elif "mel_path" in req:
                return self._json(
                    400, {"error": "arch is not mel-conditioned"}
                )
            seed = req.get("seed")
            p = pool_server.submit(
                n_samples,
                speaker=req.get("speaker"),
                cond_fn=cond_fn,
                seed=int(seed) if seed is not None else None,
                temperature=(
                    float(req["temperature"])
                    if req.get("temperature") is not None else None
                ),
            )
            if not p.done.wait(timeout=request_timeout):
                return self._json(504, {"error": "synthesis timed out"})
            if p.error is not None:
                return self._json(400, {"error": p.error})
            classes = np.concatenate(p.parts)
            if req.get("format") == "classes":
                return self._json(200, {
                    "classes": classes.tolist(), "request_id": p.rid,
                })
            from scipy.io import wavfile

            wav = np.clip(lut[classes], -1.0, 1.0)
            buf = io.BytesIO()
            wavfile.write(
                buf, arch.sample_rate, (wav * 32767.0).astype(np.int16)
            )
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Request-Id", p.rid)
            self.end_headers()
            self.wfile.write(body)

    class Server(ThreadingHTTPServer):
        # A pool-sized burst of clients connects and then WAITS minutes
        # for synthesis; the stdlib default listen backlog (5) sends RSTs
        # to the burst's tail. Handlers are daemon threads so a hung
        # client never blocks interpreter exit.
        request_queue_size = 1024
        daemon_threads = True

    return Server((host, port), Handler)
