"""Host-side continuous-batching serving loop over streaming sessions.

The device-side primitives live in generate.py (`start_stream`,
`stream_chunk`, `reset_lanes`); this module is the thin host bookkeeping
that turns them into a request-serving fleet: a fixed-shape streaming
batch compiled ONCE, whose lanes are leased to requests and recycled in
place as they finish (docs/serving.md "Continuous batching"). The
reference has no serving tier (SURVEY.md §3.2 — one Session.run per
sample); this is the build-side production counterpart.

Design constraints that shape the code:
  * everything device-side stays fixed-shape (one compile): the pool
    always steps ALL lanes and discards idle lanes' output on the host;
  * greedy/teacher-forced output is bit-identical to dedicated sessions
    (tests pin it). Sampled output DEFAULTS to the stateless per-lane
    counter hash (per_lane_rng=True), so sampled requests bit-match a
    dedicated session opened with the same submit(seed=...) — CPU == TPU,
    cost-neutral on-chip; per_lane_rng=False opts out to the
    session-global platform chain (independent but not replayable);
  * mel conditioning is per-chunk host data (cond cursors differ per
    lane), so the pool accepts a per-request `cond_fn(t0, n) -> (n, Cc)`
    callback and assembles the batch cond slab itself.
"""
from __future__ import annotations

import dataclasses
import heapq
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ArchConfig
from .generate import (
    Params,
    padded_stream_batch,
    reset_lanes,
    start_stream,
    stream_chunk,
)

# Device-side class narrowing for delivery: mu-law classes fit uint8
# (Q <= 256), and on this image's relay the D2H fetch is the serving
# loop's dominant per-step cost — shipping 1 byte/sample instead of 4
# cuts the delivered payload 4x (VERDICT r2 item 2). Jitted so the cast
# never dispatches eagerly (eager per-op dispatch is ~30 s on axon).
_narrow_u8 = jax.jit(lambda x: x.astype(jnp.uint8))


@dataclasses.dataclass
class _Lease:
    request_id: object
    remaining: int          # samples still to emit
    emitted: int = 0
    speaker: Optional[int] = None
    cond_fn: Optional[Callable] = None  # (t_local, n) -> (n, Cc) np array
    t_local: int = 0        # samples generated for THIS request so far
    start_t: int = 0        # pool-global sample index of the lease start


# Request-mode delivery (VERDICT r3 item 6): instead of fetching every
# chunk's (B, chunk) classes to the host, accumulate them into a DEVICE
# ring (B, acc_samples) uint8 — one chunk-aligned dynamic_update_slice per
# step, donated so the update is in place — and fetch ONE lane row when a
# request completes. The per-step host sync (the relay-bound cost that
# capped delivered throughput at 569 audio-sec/sec in round 3) disappears
# from the steady state entirely.
_acc_write = jax.jit(
    lambda acc, classes, pos: jax.lax.dynamic_update_slice(
        acc, classes, (0, pos)
    ),
    donate_argnums=0,
)
# Flat exact-span gather: ONE fetch per step for ALL completed requests.
# A per-request row fetch measured 8x SLOWER than chunk delivery on this
# image (~20 completions/step x one relay round-trip each, BASELINE.md
# round 4); batching every completed span into one flat index gather pays
# one round-trip and exactly span bytes (padded to the bucket size).
# Bucketing the index length to powers of two bounds the compile count.
_acc_flat_gather = jax.jit(
    lambda acc, flat_idx: jnp.take(acc.reshape(-1), flat_idx, axis=0)
)


def _pow2_bucket(n: int, lo: int = 4096) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class SessionPool:
    """Continuous-batching pool: N concurrent AR synthesis sessions/chip.

    Usage (docs/serving.md):

        pool = SessionPool(params, arch, batch=128, rng=jax.random.key(0),
                           engine="mega", chunk_size=1024)
        pool.submit("req-1", n_samples=16000, speaker=3)
        while pool.active:
            for rid, (classes, done) in pool.step().items():
                deliver(rid, classes, done)   # (n,) int32 mu-law classes

    submit() returns False when no lane is free (caller queues and retries
    after a step()). Lanes are recycled with generate.reset_lanes the step
    after their request completes.
    """

    def __init__(
        self,
        params: Params,
        arch: ArchConfig,
        batch: int,
        rng: jax.Array,
        engine: str = "mega",
        chunk_size: int = 1024,
        temperature: float = 1.0,
        pipeline: bool = False,
        per_lane_rng: bool = True,
        mesh=None,
        deliver: str = "chunk",
        acc_samples: int = 65536,
        artifact=None,
    ):
        self.params = params
        self.arch = arch
        self.batch = batch
        self.engine = engine
        self.chunk_size = chunk_size
        self.temperature = temperature
        # artifact (r5): serve a FROZEN jax.export artifact instead of the
        # in-process session — no model-construction code, no re-trace at
        # process start. Needs a per_lane export (`wavenet export
        # --per-lane`): the (3, B) lane block [seeds; lease times; 1/tau
        # bits] crosses the export boundary each step, so per-request
        # seed/temperature keep the dedicated-session replay contract.
        # `rng` is the artifact init's INT seed (a pool over the
        # in-process session built with jax.random.key(same int) is
        # bit-identical). Engine/chunk come from the manifest.
        self._artifact = artifact
        if artifact is not None:
            man = artifact.manifest
            if mesh is not None:
                raise ValueError(
                    "artifact pools are single-device (sharded artifacts "
                    "serve via ShardedServingArtifact/one-shot paths)"
                )
            if not man.get("per_lane"):
                raise ValueError(
                    "SessionPool needs a per_lane artifact "
                    "(wavenet export --per-lane); this one was exported "
                    "without the lane block"
                )
            if not per_lane_rng:
                raise ValueError("artifact pools need per_lane_rng=True")
            if temperature <= 0.0:
                raise ValueError(
                    "artifact pools need temperature > 0 (greedy requests "
                    "are submit(temperature=0))"
                )
            if bool(man["with_cond"]) != bool(arch.use_local_cond):
                raise ValueError(
                    f"artifact with_cond={man['with_cond']} does not match "
                    f"arch.use_local_cond={arch.use_local_cond}"
                )
            if arch.use_global_cond:
                raise ValueError(
                    "speaker-conditioned archs are not supported by "
                    "artifact pools (export has no speaker input)"
                )
            if not isinstance(rng, (int, np.integer)):
                raise ValueError(
                    "artifact pools take rng as an INT seed "
                    "(ServingArtifact.init seeds are integers)"
                )
            engine = self.engine = man["engine"]
            chunk_size = self.chunk_size = int(man["chunk_size"])
        # mesh (r4): serve a MODEL-SHARDED pool — the streaming session
        # runs under shard_map with the skip-split parameter layout
        # (parallel/synthesis.ShardedSession), so a model too big for one
        # chip can serve requests; composes with a data axis for fleet
        # pools. Sampling stays per-lane-hash (global_rng is not
        # reproducible under the TP step's XLA-side sampler).
        self.mesh = mesh
        self._session = None
        if mesh is not None:
            if not per_lane_rng and temperature > 0.0:
                raise ValueError(
                    "mesh pools need per_lane_rng=True (or greedy): the "
                    "session-global platform chain is not available under "
                    "model sharding"
                )
            from .parallel.synthesis import ShardedSession

            self._session = ShardedSession(
                params, arch, batch, rng, mesh, engine=engine
            )
        # pipeline=True double-buffers step(): chunk t+1 is DISPATCHED
        # (async) before chunk t's classes are fetched to the host, so the
        # device computes while the host delivers — step() then returns the
        # PREVIOUS dispatch's results ({} on the first call). The device-
        # side program order (resets, chunks) is identical to the serial
        # mode, so every request's audio is bit-identical; only delivery
        # timing shifts by one chunk.
        self.pipeline = pipeline
        self._inflight: Optional[tuple] = None
        # per_lane_rng=True (the DEFAULT, all engines): sampling noise comes
        # from a stateless counter hash over (lane_seed, lane-local time,
        # class) instead of the session-global chain — a request's SAMPLED
        # stream bit-matches a dedicated session opened with the same seed
        # (generate.perlane_gumbel; measured cost-neutral on-chip,
        # BASELINE.md). submit(seed=...) pins a request's seed; otherwise
        # one is derived from the pool seed and a running request counter.
        # per_lane_rng=False opts out to the session-global platform chain
        # (independent but non-replayable sampling).
        self.per_lane_rng = per_lane_rng
        self._t_dispatched = 0
        self._n_submitted = 0
        rng_key = jax.random.key(int(rng)) if artifact is not None else rng
        self._pool_seed = int(
            jax.random.randint(
                jax.random.fold_in(rng_key, 0x5EED), (), 0,
                np.iinfo(np.int32).max,
            )
        )
        # The device session is auto-padded to the engine's lane multiple
        # (mega: 128 on TPU) so the fastest engine serves ANY pool size;
        # pad lanes are permanently free-running throwaways, never leased.
        # Mesh pools: the TP step has no lane-multiple constraint (BlockSpec
        # lanes, not manual DMA), so the device batch is the pool batch.
        self._device_batch = (
            batch if mesh is not None else padded_stream_batch(batch, engine)
        )
        if artifact is not None and artifact.manifest["batch"] != \
                self._device_batch:
            raise ValueError(
                f"artifact batch {artifact.manifest['batch']} != the "
                f"pool's padded device batch {self._device_batch} "
                f"(pool batch {batch}, engine {engine}); export with "
                f"--batch {self._device_batch} or match the pool size"
            )
        self._lane_seed = np.zeros(self._device_batch, np.int32)
        self._lane_t0 = np.zeros(self._device_batch, np.int32)
        # Per-request temperature (VERDICT r4 item 4): a (device_batch,)
        # f32 INVERSE-temperature vector rides the per-lane sampling block;
        # inv == 0 is a greedy lane. Host-computed float32(1.0 / tau)
        # matches the folded kernel constant of a dedicated session at tau
        # bit-for-bit, so submit(temperature=...) requests replay exactly.
        self._default_inv = (
            np.float32(1.0 / temperature) if temperature > 0
            else np.float32(0.0)
        )
        self._lane_inv_temp = np.full(
            self._device_batch, self._default_inv, np.float32
        )
        self._art_state = None
        if artifact is not None:
            self._art_state = artifact.init(params, int(rng))
            self.stream = None
        else:
            self.stream = (
                None if mesh is not None
                else start_stream(arch, self._device_batch, rng,
                                  engine=engine, params=params)
            )
        self._lanes: List[Optional[_Lease]] = [None] * batch
        # Free-lane min-heap: submit() leases the LOWEST free index (same
        # semantics as a linear scan, which cost ~8 ms/step at B=1536 —
        # O(completions x B) per step) in O(log B). Invariant: the heap
        # holds exactly the indices i with _lanes[i] is None.
        self._free: List[int] = list(range(batch))
        self._pending_reset = np.zeros(self._device_batch, dtype=bool)
        # Lane 0..B-1 of a brand-new stream is already a fresh session, so
        # the first lease per lane needs no reset.
        self._fresh = np.ones(batch, dtype=bool)
        # deliver="request" (VERDICT r3 item 6): accumulate each lane's
        # classes into a device-side uint8 time ring and fetch a request's
        # audio ONCE at completion instead of every chunk — step() then
        # returns {} until a request finishes and delivers its whole
        # stream in one entry. Output is bit-identical to chunk mode
        # (tests); only the delivery granularity (and the per-step D2H)
        # changes. acc_samples bounds request length (see submit).
        if deliver not in ("chunk", "request"):
            raise ValueError(f"deliver must be 'chunk'|'request', not {deliver!r}")
        self.deliver_mode = deliver
        self._acc = None
        if deliver == "request":
            if arch.quant_channels > 256:
                raise ValueError(
                    "deliver='request' stores uint8 classes; "
                    f"quant_channels={arch.quant_channels} > 256"
                )
            if acc_samples % chunk_size:
                raise ValueError(
                    f"acc_samples {acc_samples} % chunk_size {chunk_size} "
                    f"!= 0 (ring writes must stay chunk-aligned)"
                )
            if acc_samples < 3 * chunk_size:
                raise ValueError("acc_samples must be >= 3 * chunk_size")
            if self._device_batch * acc_samples >= 2**31:
                # The completion gather builds flat int32 indices
                # lane*cap + pos; past 2^31 the cast overflows and jnp.take
                # CLAMPS under jit — silently wrong audio (ADVICE r4).
                raise ValueError(
                    f"deliver='request' ring too large: device_batch "
                    f"({self._device_batch}) * acc_samples ({acc_samples}) "
                    f"= {self._device_batch * acc_samples} >= 2^31 would "
                    f"overflow the int32 delivery gather; lower acc_samples"
                )
            self._acc = jnp.zeros(
                (self._device_batch, acc_samples), jnp.uint8
            )
        # Per-phase cumulative wall clocks (seconds), kept always — a
        # handful of perf_counter() calls per multi-ms step is free — so a
        # production loop can see WHERE its step time goes without a
        # profiler: 'reset'/'cond'/'dispatch' are host-side dispatch work
        # (async under jit), 'fetch' is the device wait + D2H, 'slice' the
        # host-side per-request delivery, 'submit' the lease scans.
        self.stats: Dict[str, float] = {
            "steps": 0, "reset_s": 0.0, "cond_s": 0.0, "dispatch_s": 0.0,
            "fetch_s": 0.0, "slice_s": 0.0, "submit_s": 0.0,
        }

    # -- request lifecycle ---------------------------------------------

    @property
    def active(self) -> bool:
        return (
            any(lease is not None for lease in self._lanes)
            or self._inflight is not None
        )

    def free_lanes(self) -> int:
        return len(self._free)

    def submit(
        self,
        request_id,
        n_samples: int,
        speaker: Optional[int] = None,
        cond_fn: Optional[Callable] = None,
        seed: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> bool:
        """Lease a free lane to a request; False if the pool is full.

        `seed` (per_lane_rng pools): the request's sampling seed — replay
        the request on a dedicated session with the same seed for a
        bit-identical sampled stream. Defaults to a deterministic
        derivation from the pool seed and the submission index.

        `temperature` (per_lane_rng pools created with temperature > 0):
        this REQUEST's sampling temperature — 0 means greedy — overriding
        the pool default for its lane. A pooled request at tau is
        bit-identical to a dedicated session at static tau with the same
        seed (tests/test_lane_temperature.py)."""
        if n_samples <= 0:
            raise ValueError(f"n_samples must be positive, got {n_samples}")
        if speaker is not None and not self.arch.use_global_cond:
            raise ValueError("speaker given but arch.n_speakers == 0")
        if (cond_fn is not None) != self.arch.use_local_cond:
            raise ValueError(
                "cond_fn must be passed iff the arch is mel-conditioned"
            )
        if seed is not None and not self.per_lane_rng:
            raise ValueError("submit(seed=...) needs per_lane_rng=True")
        if temperature is not None:
            if not self.per_lane_rng:
                raise ValueError(
                    "submit(temperature=...) needs per_lane_rng=True"
                )
            if self.temperature <= 0.0:
                raise ValueError(
                    "per-request temperature needs a SAMPLED pool "
                    "(construct SessionPool with temperature > 0; greedy "
                    "requests are submit(temperature=0) on such a pool)"
                )
            if temperature < 0.0:
                raise ValueError(f"temperature must be >= 0, got {temperature}")
        if self._acc is not None:
            cap = int(self._acc.shape[1])
            # cap - 2*chunk: the span a request occupies in the time ring
            # (rounded up to whole chunks) plus ONE in-flight pipelined
            # chunk must never lap its own oldest sample.
            if n_samples > cap - 2 * self.chunk_size:
                raise ValueError(
                    f"deliver='request' pools bound n_samples at "
                    f"acc_samples - 2*chunk = {cap - 2 * self.chunk_size} "
                    f"(got {n_samples}); raise acc_samples"
                )
        t0 = time.perf_counter()
        try:
            if not self._free:
                return False
            i = heapq.heappop(self._free)
            self._lanes[i] = _Lease(
                request_id, n_samples, speaker=speaker,
                cond_fn=cond_fn, start_t=self._t_dispatched,
            )
            if self.per_lane_rng:
                if seed is None:
                    seed = (
                        self._pool_seed
                        + self._n_submitted * 0x9E3779B9
                    ) & 0x7FFFFFFF
                self._lane_seed[i] = np.int32(seed & 0x7FFFFFFF)
                # Lane-local time starts at the NEXT dispatch.
                self._lane_t0[i] = self._t_dispatched
                self._lane_inv_temp[i] = (
                    self._default_inv if temperature is None
                    else np.float32(1.0 / temperature)
                    if temperature > 0 else np.float32(0.0)
                )
            self._n_submitted += 1
            if not self._fresh[i]:
                self._pending_reset[i] = True
            self._fresh[i] = False
            return True
        finally:
            self.stats["submit_s"] += time.perf_counter() - t0

    # -- the serving step ------------------------------------------------

    def step(self) -> Dict[object, tuple]:
        """Advance the pool one chunk; returns {request_id: (classes,
        done)} where classes is a request's next (<= chunk_size,) int32
        slice (trimmed to its remaining length).

        Serial mode: dispatches one chunk and delivers it. Pipeline mode:
        dispatches the next chunk FIRST (async), then delivers the chunk
        dispatched by the previous call — the first call returns {}."""
        if not self.pipeline:
            return self._deliver(self._dispatch())
        prev = self._inflight
        self._inflight = (
            self._dispatch()
            if any(lease is not None for lease in self._lanes) else None
        )
        return self._deliver(prev) if prev is not None else {}

    def _dispatch(self) -> tuple:
        """Apply pending resets and launch one chunk for the current
        leases (async); lease bookkeeping advances NOW (a finished lane is
        reusable from the next dispatch), returning (device classes,
        delivery metadata)."""
        t0 = time.perf_counter()
        if self._pending_reset.any():
            if self._artifact is not None:
                self._art_state = self._artifact.reset(
                    self.params, self._art_state,
                    jnp.asarray(self._pending_reset.copy()),
                )
            elif self._session is not None:
                self._session.reset_lanes(self._pending_reset.copy())
            else:
                self.stream = reset_lanes(
                    self.params, self.arch, self.stream,
                    # .copy(): on the CPU backend jnp.asarray can ZERO-COPY
                    # alias numpy memory, and this host array is mutated
                    # below while the async dispatch may still be reading
                    # it — a real race (bit-flips in recycled lanes) first
                    # caught by the pipelined-pool test.
                    jnp.asarray(self._pending_reset.copy()),
                    engine=self.engine,
                )
            self._pending_reset[:] = False
        t1 = time.perf_counter()
        self.stats["reset_s"] += t1 - t0

        speaker_ids = None
        if self.arch.use_global_cond:
            ids = [
                lease.speaker if lease is not None and lease.speaker
                is not None else 0
                for lease in self._lanes
            ] + [0] * (self._device_batch - self.batch)  # pad lanes
            speaker_ids = jnp.asarray(ids, jnp.int32)
        cond = None
        if self.arch.use_local_cond:
            cc = self.arch.cond_channels
            slab = np.zeros(
                (self._device_batch, self.chunk_size, cc), np.float32
            )
            for i, lease in enumerate(self._lanes):
                if lease is not None:
                    # Only ask cond_fn for the frames the request will
                    # actually consume; the tail of a final partial chunk
                    # is zero-padded here, so a cond_fn covering exactly
                    # n_samples frames never over-reads.
                    n_need = min(self.chunk_size, lease.remaining)
                    span = np.asarray(lease.cond_fn(lease.t_local, n_need))
                    if span.shape != (n_need, cc):
                        raise ValueError(
                            f"cond_fn returned {span.shape}, expected "
                            f"({n_need}, {cc})"
                        )
                    slab[i, :n_need] = span
            cond = jnp.asarray(slab, jnp.dtype(self.arch.compute_dtype))
        t2 = time.perf_counter()
        self.stats["cond_s"] += t2 - t1

        lane_kw = {}
        if self.per_lane_rng and self._artifact is None:
            lane_kw = dict(
                # .copy(): same zero-copy aliasing hazard as the reset mask
                # (these are mutated at submit() while a dispatch is live).
                lane_seed=jnp.asarray(self._lane_seed.copy()),
                lane_t0=jnp.asarray(self._lane_t0.copy()),
            )
            if self.temperature > 0.0:
                # Always ride the per-lane inverse-temperature row on
                # sampled pools (one trace; logits * f32(1/tau) is
                # bit-identical to the folded-constant form, so pools
                # without custom-temperature requests are unchanged).
                lane_kw["lane_inv_temp"] = jnp.asarray(
                    self._lane_inv_temp.copy()
                )
        if self._artifact is not None:
            # One (3, B) int32 upload per step (np.stack allocates fresh
            # memory, so the zero-copy aliasing hazard of the mutated
            # host arrays does not apply).
            lane = np.stack([
                self._lane_seed,
                self._lane_t0,
                self._lane_inv_temp.view(np.int32),
            ])
            classes, self._art_state = self._artifact.step(
                self.params, self._art_state, cond=cond,
                lane=jnp.asarray(lane),
            )
        elif self._session is not None:
            classes = self._session.chunk(
                self.chunk_size, cond=cond, speaker_ids=speaker_ids,
                temperature=self.temperature, **lane_kw,
            )
        else:
            classes, self.stream = stream_chunk(
                self.params, self.arch, self.stream, self.chunk_size,
                cond=cond, speaker_ids=speaker_ids,
                temperature=self.temperature, engine=self.engine,
                # per_lane_rng=False means the session-GLOBAL chain, not the
                # engine-default derived lane seeds (which would be lane-
                # position-dependent and mid-stream non-replayable anyway).
                global_rng=not self.per_lane_rng,
                **lane_kw,
            )
        if self.arch.quant_channels <= 256:
            classes = _narrow_u8(classes)
        if self._acc is not None:
            # Device-side accumulation: ONE chunk-aligned ring write, no
            # host fetch this step (classes never cross to the host here).
            pos = self._t_dispatched % int(self._acc.shape[1])
            self._acc = _acc_write(self._acc, classes, pos)
        self._t_dispatched += self.chunk_size

        meta = []
        for i, lease in enumerate(self._lanes):
            if lease is None:
                continue
            n = min(self.chunk_size, lease.remaining)
            lease.remaining -= n
            lease.emitted += n
            lease.t_local += self.chunk_size
            done = lease.remaining == 0
            if self._acc is None:
                meta.append((i, lease.request_id, n, done))
            elif done:
                # Request mode delivers once, at completion: whole stream.
                meta.append(
                    (i, lease.request_id, lease.emitted, True, lease.start_t)
                )
            if done:
                self._lanes[i] = None
                heapq.heappush(self._free, i)
                self._pending_reset[i] = True
        # Every lane (leased or idle) just advanced chunk_size steps of
        # free-running state, so no lane is "fresh t=0" any more: a first
        # lease landing on a never-used lane after this point MUST reset it
        # or it would inherit free-run ring history (silently corrupt audio).
        self._fresh[:] = False
        self.stats["steps"] += 1
        self.stats["dispatch_s"] += time.perf_counter() - t2
        return classes, meta

    def _deliver(self, inflight: tuple) -> Dict[object, tuple]:
        """Fetch a dispatched chunk to the host and slice per request.

        Chunk mode: the (B, chunk) fetch crosses the device boundary as
        uint8 (4x smaller D2H); per-request slices are widened back to
        int32 on the host so the delivered API dtype is unchanged.

        Request mode: nothing is fetched per step — each COMPLETED
        request's lane row is fetched once from the device time ring and
        its span sliced out on the host (wrap-aware). NOTE the ring is
        read at its CURRENT state, not a snapshot: the submit() length
        bound guarantees the one pipelined in-flight chunk cannot have
        lapped a just-completed request's span."""
        classes_dev, meta = inflight
        if self._acc is not None:
            if not meta:
                return {}
            cap = int(self._acc.shape[1])
            spans = []
            total = 0
            for i, rid, n, _done, start_t in meta:
                spans.append((rid, total, n, i, start_t))
                total += n
            flat = np.empty(total, np.int64)
            for _rid, off, n, lane, start_t in spans:
                flat[off : off + n] = lane * cap + (
                    (start_t + np.arange(n)) % cap
                )
            bucket = _pow2_bucket(total)
            idx = np.zeros(bucket, np.int32)
            idx[:total] = flat
            t0 = time.perf_counter()
            data = np.asarray(
                _acc_flat_gather(self._acc, jnp.asarray(idx))
            )  # ONE device round-trip for every completion this step
            t1 = time.perf_counter()
            out = {
                rid: (data[off : off + n].astype(np.int32), True)
                for rid, off, n, _lane, _t in spans
            }
            self.stats["fetch_s"] += t1 - t0
            self.stats["slice_s"] += time.perf_counter() - t1
            return out
        t0 = time.perf_counter()
        classes = np.asarray(classes_dev)
        t1 = time.perf_counter()
        out = {
            rid: (classes[i, :n].astype(np.int32), done)
            for i, rid, n, done in meta
        }
        self.stats["fetch_s"] += t1 - t0
        self.stats["slice_s"] += time.perf_counter() - t1
        return out
