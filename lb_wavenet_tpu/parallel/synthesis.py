"""Distributed synthesis: fleet batch-sharding and GSPMD model sharding.

BASELINE.json north-star: "autoregressive synthesis batches many utterances
per chip and shards the model across chips via GSPMD only if it exceeds one
chip, exchanging logits/state via ICI collectives."

* Fleet synthesis (the common case): every chip owns a batch shard of the
  utterances; the model is replicated.
  - `engine="xla"`: ONE jitted call over the mesh — GSPMD partitions the
    whole scan by batch with zero collectives in the loop, and the sampled
    stream is bit-identical to the single-device run (the RNG chain is
    partitioned, not re-keyed).
  - Fused engines (`pallas`/`turbo`/`mega`): hand-written single-chip Pallas
    programs, so each data shard runs its own kernel under `shard_map`; the
    sampling key is `fold_in`-decorrelated per shard (a shard's sampled
    stream equals a single-chip run of that shard with the folded key;
    greedy/forced paths bit-match the single-device run exactly).
* Model-sharded synthesis (models larger than one chip, e.g. the 512-skip
  stress config grown further): stacked weights are sharded on their
  skip/gate channel dimensions over the `model` axis; GSPMD inserts the
  ICI all-reduces for the skip accumulation / post-network contractions
  inside the sample loop. XLA engine only (GSPMD freely repartitions it;
  the Pallas kernels are single-chip programs). Composes with fleet
  batch-sharding on the `data` axis of the same mesh.

Multi-process: array arguments are the GLOBAL batch, loaded identically on
every host (the `wavenet generate` inputs — mel .npy, primer, speaker ids —
are host-replicated files); placement uses `make_array_from_callback`, so no
assumption about device→process ordering is made. Outputs come back as
global arrays — consume per-host rows via `.addressable_shards` (each shard
carries its global `index`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ArchConfig
from ..generate import generate_classes
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

FUSED_ENGINES = ("pallas", "turbo", "mega")

# One-shot mesh synthesis used to rebuild its jit(shard_map(...)) closure
# on EVERY call — jax.jit caches by function identity, so each call paid a
# full retrace (the first tp_floor_bench measurement was drowned by
# exactly this). Programs are now cached by their static configuration;
# anything that changes the traced computation (mesh, arch, engine,
# shapes, temperature, kwargs, params tree structure) is in the key.
# LRU-bounded (ADVICE r4): each entry pins a compiled executable plus its
# captured mesh for process lifetime, a slow leak in long-running serving
# processes sweeping configs. Insertion order IS recency order (entries
# are re-inserted on hit), so eviction pops the front.
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_CAP = 32


def _lru_get(cache: dict, key, build, cap: int):
    fn = cache.pop(key, None)
    if fn is None:
        fn = build()
    cache[key] = fn  # (re)insert at the back = most recent
    while len(cache) > cap:
        cache.pop(next(iter(cache)))
    return fn


def _cached_program(key, build):
    try:
        hash(key)
    except TypeError:       # unhashable kwarg value: build uncached
        return build()
    return _lru_get(_PROGRAM_CACHE, key, build, _PROGRAM_CACHE_CAP)


def _batch_spec(arr) -> P:
    """Full-rank spec sharding the leading (batch) dim over `data`."""
    return P(DATA_AXIS, *([None] * (np.ndim(arr) - 1)))


def _place_global(arr, mesh: Mesh, spec: P):
    """Host-identical numpy array -> global jax.Array (single- OR multi-
    process; `make_array_from_callback` needs no device-order assumption)."""
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda i: arr[i])


def _place_batch_args(mesh: Mesh, cond, speaker_ids, forced) -> dict:
    out = {}
    for name, val in (
        ("cond", cond), ("speaker_ids", speaker_ids), ("forced", forced)
    ):
        if val is not None:
            out[name] = _place_global(val, mesh, _batch_spec(val))
    return out


def mesh_generate_classes(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    engine: str = "mega",
    cond: Optional[jnp.ndarray] = None,        # (B, T>=n, Cc) upsampled
    speaker_ids: Optional[jnp.ndarray] = None,  # (B,)
    forced: Optional[jnp.ndarray] = None,       # (B, T) classes, -1 = free
    temperature: float = 1.0,
    **kwargs,
):
    """Generate (batch, n_samples) classes over the mesh.

    `batch` is the GLOBAL utterance count; it must divide by the data-axis
    size (and the per-chip shard must satisfy the engine's constraints).
    Array args are the global batch, identical on every process. Returns a
    global array sharded (data,) over the batch dim.
    """
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    if batch % n_data:
        raise ValueError(f"global batch {batch} % data axis {n_data} != 0")
    if n_model > 1 and engine in FUSED_ENGINES:
        # Kernel-speed TP: each shard runs a fused kernel on its
        # SKIP-channel slice; one per-step psum completes the post hidden.
        # engine="pallas" (r3) uses the batch-major ar_step kernel +
        # generate.post_network_sharded; "turbo"/"mega" (r4) share the
        # mega-class feature-major per-step kernel (ops/pallas/ar_tp.py —
        # the whole-loop formulation degenerates to per-step once the psum
        # collective enters the loop). Composes with the data axis. The
        # skip split needs no per-layer collective because
        # skip = sum_l z_l @ w_skip_l is column-separable.
        return _skip_sharded_generate(
            params, arch, rng, batch, n_samples, mesh, engine,
            cond, speaker_ids, forced, temperature, **kwargs,
        )

    param_specs = (
        model_sharded_param_specs(params) if n_model > 1
        else jax.tree_util.tree_map(lambda _: P(), params)
    )
    params = jax.tree_util.tree_map(
        lambda x, sp: _place_global(x, mesh, sp), params, param_specs
    )
    # PRNG keys can't ride make_array_from_callback (extended dtype) and
    # multi-process device_put rejects non-addressable shardings: ship the
    # raw key data replicated and rewrap inside the trace.
    key_impl = str(jax.random.key_impl(rng))
    key_data = _place_global(jax.random.key_data(rng), mesh, P())
    opt = _place_batch_args(mesh, cond, speaker_ids, forced)
    out_sharding = NamedSharding(mesh, P(DATA_AXIS, None))

    cache_key = (
        "fleet", engine, mesh, arch, batch, n_samples, float(temperature),
        key_impl, tuple(sorted((k, np.ndim(v)) for k, v in opt.items())),
        tuple(sorted(kwargs.items())),
        jax.tree_util.tree_structure(params),
        n_model,
    )

    if engine == "xla":
        # GSPMD: trace the GLOBAL computation once; the compiler partitions
        # the scan by batch (and by channel when the model axis is used).
        def build_xla():
            return jax.jit(
                lambda p, r, o: generate_classes(
                    p, arch, jax.random.wrap_key_data(r, impl=key_impl),
                    batch, n_samples, engine=engine,
                    temperature=temperature, **o, **kwargs,
                ),
                out_shardings=out_sharding,
            )

        return _cached_program(cache_key, build_xla)(params, key_data, opt)

    # Fused Pallas engines: one single-chip kernel per data shard.
    shard_b = batch // n_data
    opt_specs = {k: _batch_spec(v) for k, v in opt.items()}

    def build_fused():
        def per_shard(p, r, o):
            r = jax.random.wrap_key_data(r, impl=key_impl)
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
            return generate_classes(
                p, arch, r, shard_b, n_samples, engine=engine,
                temperature=temperature, **o, **kwargs,
            )

        return jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(), opt_specs),
                out_specs=P(DATA_AXIS, None),
                # The Pallas calls don't declare varying-mesh-axis metadata.
                check_vma=False,
            ),
            out_shardings=out_sharding,
        )

    return _cached_program(cache_key, build_fused)(params, key_data, opt)


def skip_sharded_param_specs(params) -> dict:
    """PartitionSpecs for the shard_map TP path: ONLY the skip-separable
    dims are sliced — w_skip/b_skip on the skip dim and post.w1 on its
    contraction rows; everything else (taps, residual, embed, post w2/b2)
    is replicated. The per-step psum in generate.post_network_sharded is
    the entire collective budget (docs/kernels.md)."""

    def spec(path, leaf):
        names = [getattr(p2, "key", getattr(p2, "name", None)) for p2 in path]
        if "layers" in names:
            if names[-1] == "w_skip":
                return P(None, None, MODEL_AXIS)   # (L, G, S): shard S
            if names[-1] == "b_skip":
                return P(None, MODEL_AXIS)         # (L, S)
        if "post" in names and names[-1] == "w1":
            return P(MODEL_AXIS, None)             # (S, S): shard rows (K)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _skip_sharded_generate(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    engine: str,
    cond,
    speaker_ids,
    forced,
    temperature: float,
    **kwargs,
):
    """Model-sharded synthesis at fused-kernel speed (shard_map).

    Every model shard runs the SAME replicated computation except the skip
    projection / post-w1 rows it owns; the post hidden is completed with
    one psum per sample step. The sampling chain (threefry key or per-lane
    hash) is replicated over the model axis, so all shards emit identical
    classes; greedy/forced output equals the single-device run (float
    association of the psum vs the unsharded contraction can differ at
    f32 rounding — class-level equality is what the tests pin, exactly
    like the GSPMD xla path). Composes with data-axis batch sharding
    (fold_in decorrelates the DATA shards only)."""
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]
    if arch.skip_channels % n_model:
        # Without this, a non-dividing mesh surfaces as an opaque
        # shard_map/sharding error deep inside jit (ADVICE r3).
        raise ValueError(
            f"skip-split model sharding needs skip_channels "
            f"({arch.skip_channels}) % model axis ({n_model}) == 0"
        )
    if kwargs.get("return_logits"):
        # The shard_map out_specs cover a single (B, T) class output; a
        # tuple return would fail with a confusing pytree-structure error
        # (ADVICE r3).
        raise ValueError(
            "return_logits is not supported under model-axis sharding; "
            "run the xla engine unsharded (or per shard) for logits"
        )
    shard_b = batch // n_data
    param_specs = skip_sharded_param_specs(params)
    params = jax.tree_util.tree_map(
        lambda x, sp: _place_global(x, mesh, sp), params, param_specs
    )
    key_impl = str(jax.random.key_impl(rng))
    key_data = _place_global(jax.random.key_data(rng), mesh, P())
    opt = _place_batch_args(mesh, cond, speaker_ids, forced)
    opt_specs = {k: _batch_spec(v) for k, v in opt.items()}
    out_sharding = NamedSharding(mesh, P(DATA_AXIS, None))

    cache_key = (
        "skip_sharded", engine, mesh, arch, batch, n_samples,
        float(temperature), key_impl,
        tuple(sorted((k, np.ndim(v)) for k, v in opt.items())),
        tuple(sorted(kwargs.items())),
        jax.tree_util.tree_structure(param_specs),
    )

    def build():
        def per_shard(p, r, o):
            r = jax.random.wrap_key_data(r, impl=key_impl)
            # Decorrelate DATA shards only: the model shards of one data
            # shard must follow the identical sampling chain.
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
            return generate_classes(
                p, arch, r, shard_b, n_samples, engine=engine,
                temperature=temperature, model_axis=MODEL_AXIS,
                **o, **kwargs,
            )

        return jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(param_specs, P(), opt_specs),
                out_specs=P(DATA_AXIS, None),
                check_vma=False,  # pallas calls carry no vma metadata
            ),
            out_shardings=out_sharding,
        )

    return _cached_program(cache_key, build)(params, key_data, opt)


class ShardedSession:
    """Model-sharded STREAMING session (r4, VERDICT r3 item 5): a model too
    big for one chip can now stream and serve, not just one-shot.

    Wraps generate's streaming primitives (start_stream / stream_chunk /
    reset_lanes) in shard_map over a (data, model) mesh with the skip-split
    parameter layout (skip_sharded_param_specs): fused engines (turbo/mega)
    carry the feature-major TP step state (ops/pallas/ar_tp.py, one psum
    per step), the pallas engine carries its RingState with the per-step
    psum at the post hidden. Chunked output bit-matches the sharded
    one-shot path (same fold_in/seed_base derivation, absolute-time ring
    phase — tests/test_distributed_synthesis.py).

    Single-controller usage (SessionPool's mesh mode, `wavenet serve
    --mesh-model`): inputs are host-replicated global arrays; classes come
    back as a global (B, chunk) array sharded over `data`.
    """

    def __init__(
        self,
        params,
        arch: ArchConfig,
        batch: int,
        rng: jax.Array,
        mesh: Mesh,
        engine: str = "mega",
    ):
        if engine not in FUSED_ENGINES:
            raise ValueError(
                f"ShardedSession engines: {FUSED_ENGINES}; the xla engine "
                f"streams via GSPMD jit directly"
            )
        n_data = mesh.shape[DATA_AXIS]
        n_model = mesh.shape[MODEL_AXIS]
        if batch % n_data:
            raise ValueError(f"batch {batch} % data axis {n_data} != 0")
        if arch.skip_channels % n_model:
            raise ValueError(
                f"skip-split model sharding needs skip_channels "
                f"({arch.skip_channels}) % model axis ({n_model}) == 0"
            )
        self.arch = arch
        self.mesh = mesh
        self.engine = engine
        self.batch = batch
        self.shard_b = batch // n_data
        self._tp = engine in ("turbo", "mega")
        self.param_specs = skip_sharded_param_specs(params)
        self.params = jax.tree_util.tree_map(
            lambda x, sp: _place_global(x, mesh, sp), params, self.param_specs
        )
        self._chunk_fns = {}

        from .. import generate as G

        key_impl = str(jax.random.key_impl(rng))
        key_data = _place_global(mesh=mesh, spec=P(), arr=jax.random.key_data(rng))
        state_specs = self._state_specs()

        def per_shard_init(p, kd):
            r = jax.random.wrap_key_data(kd, impl=key_impl)
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
            stream = G.start_stream(
                self.arch, self.shard_b, r, engine=engine, params=p,
                model_axis=MODEL_AXIS if self._tp else None,
            )
            return stream.state, stream.t

        init = jax.jit(shard_map(
            per_shard_init, mesh=mesh,
            in_specs=(self.param_specs, P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        ))
        self._state, self._t = init(self.params, key_data)
        self._state_specs_cached = state_specs

        def per_shard_reset(p, state, t, mask):
            s = G.reset_lanes(
                p, self.arch, G.Stream(state, t), mask, engine=engine,
                model_axis=MODEL_AXIS if self._tp else None,
            )
            return s.state, s.t

        self._reset_fn = jax.jit(shard_map(
            per_shard_reset, mesh=mesh,
            in_specs=(self.param_specs, state_specs, P(), P(DATA_AXIS)),
            out_specs=(state_specs, P()),
            check_vma=False,
        ))

    def _state_specs(self):
        from ..generate import RingState

        if self._tp:
            return {
                "bufs": P(None, None, DATA_AXIS),
                "h": P(None, DATA_AXIS),
                "e_s": P(None, DATA_AXIS),
                "seed_base": P(),
            }
        return RingState(
            embed_buf=P(None, DATA_AXIS, None),
            bufs=P(None, DATA_AXIS, None),
            prev_class=P(DATA_AXIS),
            rng=P(),
        )

    @property
    def t(self) -> int:
        return int(np.asarray(self._t))

    def chunk(
        self,
        chunk_size: int,
        cond=None,                 # (B, chunk, Cc) np/jnp, host-replicated
        speaker_ids=None,          # (B,)
        forced=None,               # (B, chunk)
        temperature: float = 1.0,
        lane_seed=None,            # (B,) int32 (serving pools)
        lane_t0=None,
        lane_inv_temp=None,        # (B,) f32 1/tau per lane (0 = greedy)
    ):
        """Emit the next chunk: returns a global (B, chunk) class array
        sharded over `data`; the session state advances in place."""
        from .. import generate as G

        opt = {}
        for name, val in (
            ("cond", cond), ("speaker_ids", speaker_ids), ("forced", forced),
            ("lane_seed", lane_seed), ("lane_t0", lane_t0),
            ("lane_inv_temp", lane_inv_temp),
        ):
            if val is not None:
                opt[name] = _place_global(val, self.mesh, _batch_spec(val))
        key = (chunk_size, float(temperature), tuple(sorted(opt)))

        def build():
            specs = {k: _batch_spec(v) for k, v in opt.items()}

            def per_shard_chunk(p, state, t, o):
                cls, new_stream = G.stream_chunk(
                    p, self.arch, G.Stream(state, t), chunk_size,
                    temperature=temperature, engine=self.engine,
                    model_axis=MODEL_AXIS,
                    **o,
                )
                return cls, new_stream.state, new_stream.t

            return jax.jit(shard_map(
                per_shard_chunk, mesh=self.mesh,
                in_specs=(
                    self.param_specs, self._state_specs_cached, P(), specs
                ),
                out_specs=(
                    P(DATA_AXIS, None), self._state_specs_cached, P()
                ),
                check_vma=False,
            ))

        # LRU-bounded like _PROGRAM_CACHE (ADVICE r4): a long-lived session
        # sweeping chunk sizes/temperatures must not pin executables forever.
        fn = _lru_get(self._chunk_fns, key, build, cap=16)
        cls, self._state, self._t = fn(
            self.params, self._state, self._t, opt
        )
        return cls

    def reset_lanes(self, lane_mask) -> None:
        """Recycle the masked lanes to fresh t=0 sessions (continuous
        batching under model sharding)."""
        mask = _place_global(
            np.asarray(lane_mask, bool), self.mesh, P(DATA_AXIS)
        )
        self._state, self._t = self._reset_fn(
            self.params, self._state, self._t, mask
        )


def fleet_generate_classes(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    engine: str = "mega",
    **kwargs,
):
    """Batch-sharded generation over the mesh's data axis (replicated model)."""
    return mesh_generate_classes(
        params, arch, rng, batch, n_samples, mesh, engine=engine, **kwargs
    )


def model_sharded_param_specs(params) -> dict:
    """PartitionSpecs sharding the wide channel dims over `model`.

    Gate channels (2G) of the dilated-tap weights and skip channels (S) of
    the skip/post weights are the natural split: each chip computes a slice
    of every gate and of the skip accumulator; GSPMD reduces where needed.
    """

    def spec(path, leaf):
        names = [getattr(p2, "key", getattr(p2, "name", None)) for p2 in path]
        if "layers" in names:
            leafname = names[-1]
            if leafname in ("w_cur", "w_prev", "w_cond", "w_gcond"):
                return P(None, None, MODEL_AXIS)   # (L, C, 2G): shard 2G
            if leafname == "b":
                return P(None, MODEL_AXIS)         # (L, 2G)
            if leafname == "w_res":
                return P(None, MODEL_AXIS, None)   # (L, G, C): shard G (contraction)
            if leafname == "w_skip":
                return P(None, MODEL_AXIS, None)   # (L, G, S): shard G
        if "post" in names:
            if names[-1] == "w1":
                return P(MODEL_AXIS, None)         # (S, S): shard rows
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def model_sharded_generate_classes(
    params,
    arch: ArchConfig,
    rng: jax.Array,
    batch: int,
    n_samples: int,
    mesh: Mesh,
    engine: str = "xla",
    **kwargs,
):
    """Generation with the model sharded over the `model` mesh axis.

    engine="xla": GSPMD partitions the traced computation (collectives
    inserted by the compiler). engine="pallas" (r3): shard_map skip-split
    at fused-kernel speed — one psum per step."""
    return mesh_generate_classes(
        params, arch, rng, batch, n_samples, mesh, engine=engine, **kwargs
    )
