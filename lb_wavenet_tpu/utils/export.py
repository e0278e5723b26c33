"""AOT serving artifacts: jax.export'ed synthesis step functions.

Deployment path (SURVEY.md §5 config/serving; docs/serving.md): the
reference re-traces its generation graph from Python source at every
process start. Here the jitted streaming-synthesis step is exported ONCE to
a versioned on-disk artifact (StableHLO via `jax.export`) and reloaded by a
serving process with `load_serving` — no model-construction code, no
re-trace, stable across framework-code changes. Parameters are NOT baked
in: the exported functions take the params pytree as an argument, so one
artifact serves every checkpoint of its architecture (params come from the
orbax checkpoints written by training).

An artifact directory contains:
  manifest.json   arch config + static choices (batch, chunk_size, engine,
                  temperature, with_cond, platforms, jax version)
  init.jaxexport  (params, seed:int32) -> state        [exported]
  step.jaxexport  (params, state[, cond]) -> (classes, state)   [exported]
  reset.jaxexport (params, state, lane_mask:bool[B]) -> state   [exported]
                  (continuous batching: recycle finished lanes in place —
                  generate.reset_lanes behind the export boundary)

`state` crosses the boundary as a plain dict of arrays (PRNG keys carried
as raw uint32 key data) so serialization needs no custom pytree
registration. Bit parity with the in-process streaming session
(generate.start_stream/stream_chunk) is tested in tests/test_export.py.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..config import ArchConfig

ARTIFACT_VERSION = 2
_MANIFEST = "manifest.json"
_INIT = "init.jaxexport"
_STEP = "step.jaxexport"
_RESET = "reset.jaxexport"

# Pallas TPU kernels lower to the Mosaic custom call, which jax.export does
# not list as guaranteed-stable; artifacts embedding it are tied to a
# compatible libtpu (recorded in the manifest) — standard practice for
# kernel-bearing exports.
_TPU_CUSTOM_CALLS = ("tpu_custom_call",)


def _stream_to_flat(stream, engine: str) -> dict:
    """Stream (generate.Stream) -> plain dict-of-arrays state."""
    if engine == "mega":
        st = dict(stream.state["carry"])
        st["seed_base"] = stream.state["seed_base"]
        st["t"] = stream.t
        return st
    if engine == "turbo":
        st = dict(stream.state)  # {"bufs", "e", "h", "seed_base"}
        st["t"] = stream.t
        return st
    rs = stream.state
    return {
        "embed_buf": rs.embed_buf,
        "bufs": rs.bufs,
        "prev_class": rs.prev_class,
        "rng_data": jax.random.key_data(rs.rng),
        "t": stream.t,
    }


def _flat_to_stream(flat: dict, engine: str):
    from ..generate import RingState, Stream

    if engine == "mega":
        st = dict(flat)
        t = st.pop("t")
        seed_base = st.pop("seed_base")
        return Stream({"carry": st, "seed_base": seed_base}, t)
    if engine == "turbo":
        st = dict(flat)
        t = st.pop("t")
        return Stream(st, t)
    return Stream(
        RingState(
            embed_buf=flat["embed_buf"],
            bufs=flat["bufs"],
            prev_class=flat["prev_class"],
            rng=jax.random.wrap_key_data(flat["rng_data"]),
        ),
        flat["t"],
    )


def _make_fns(arch: ArchConfig, batch: int, chunk_size: int, engine: str,
              temperature: float, with_cond: bool, per_lane: bool = False):
    from ..generate import reset_lanes, start_stream, stream_chunk

    def init_fn(params, seed):
        stream = start_stream(
            arch, batch, jax.random.key(seed), engine=engine, params=params
        )
        return _stream_to_flat(stream, engine)

    def step_fn(params, state, *rest):
        stream = _flat_to_stream(state, engine)
        lane_kw = {}
        idx = 0
        if per_lane:
            # Pool-grade step (r5): a (3, B) int32 lane block — [seeds;
            # lease times; f32(1/tau) BITS] — crosses the export boundary
            # as ONE input, exactly generate._pack_lane's layout, so a
            # SessionPool can serve this artifact with full per-request
            # seed/temperature controls (serving.py artifact mode).
            lane = rest[0]
            idx = 1
            lane_kw = dict(
                lane_seed=lane[0],
                lane_t0=lane[1],
                lane_inv_temp=jax.lax.bitcast_convert_type(
                    lane[2], jnp.float32
                ),
            )
        cond = rest[idx] if with_cond else None
        classes, new_stream = stream_chunk(
            params, arch, stream, chunk_size, cond=cond,
            temperature=temperature, engine=engine, **lane_kw,
        )
        return classes, _stream_to_flat(new_stream, engine)

    def reset_fn(params, state, lane_mask):
        stream = _flat_to_stream(state, engine)
        new = reset_lanes(params, arch, stream, lane_mask, engine=engine)
        return _stream_to_flat(new, engine)

    return init_fn, step_fn, reset_fn


def export_serving(
    params,
    arch: ArchConfig,
    batch: int,
    chunk_size: int,
    out_dir: str,
    engine: str = "xla",
    temperature: float = 1.0,
    with_cond: bool = False,
    per_lane: bool = False,
) -> dict:
    """Export the streaming-synthesis session to `out_dir`; returns the
    manifest. `params` provides shapes/dtypes only — weights are not baked
    into the artifact. `per_lane` adds a (3, B) int32 lane block to step
    (seeds / lease times / inverse-temperature bits) so the artifact can
    back a SessionPool with per-request sampling controls."""
    if engine not in ("xla", "pallas", "turbo", "mega"):
        raise ValueError(
            f"exportable engines: xla|pallas|turbo|mega, got {engine}"
        )
    if per_lane and temperature <= 0.0:
        raise ValueError(
            "per_lane exports need temperature > 0 (greedy lanes are "
            "expressed as inverse-temperature 0)"
        )
    init_fn, step_fn, reset_fn = _make_fns(
        arch, batch, chunk_size, engine, temperature, with_cond,
        per_lane=per_lane,
    )
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params,
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    state_spec = jax.eval_shape(init_fn, p_spec, seed_spec)
    step_args = [p_spec, state_spec]
    if per_lane:
        step_args.append(jax.ShapeDtypeStruct((3, batch), jnp.int32))
    if with_cond:
        step_args.append(
            jax.ShapeDtypeStruct(
                (batch, chunk_size, arch.cond_channels),
                jnp.dtype(arch.compute_dtype),
            )
        )
    checks = [
        jexport.DisabledSafetyCheck.custom_call(t) for t in _TPU_CUSTOM_CALLS
    ] if engine in ("pallas", "turbo", "mega") else []

    exp_init = jexport.export(jax.jit(init_fn), disabled_checks=checks)(
        p_spec, seed_spec
    )
    exp_step = jexport.export(jax.jit(step_fn), disabled_checks=checks)(
        *step_args
    )
    mask_spec = jax.ShapeDtypeStruct((batch,), jnp.bool_)
    exp_reset = jexport.export(jax.jit(reset_fn), disabled_checks=checks)(
        p_spec, state_spec, mask_spec
    )

    init_bytes = exp_init.serialize()
    step_bytes = exp_step.serialize()
    reset_bytes = exp_reset.serialize()
    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "arch": dataclasses.asdict(arch),
        "batch": batch,
        "chunk_size": chunk_size,
        "engine": engine,
        "temperature": temperature,
        "with_cond": with_cond,
        "per_lane": per_lane,
        "platforms": list(exp_step.platforms),
        "jax_version": jax.__version__,
        # Bind the manifest to exactly these binaries: a crash between the
        # per-file atomic writes (e.g. re-exporting over an old artifact)
        # leaves a mixed-generation directory, which load_serving rejects
        # by hash instead of serving the wrong function.
        "sha256": {
            _INIT: hashlib.sha256(init_bytes).hexdigest(),
            _STEP: hashlib.sha256(step_bytes).hexdigest(),
            _RESET: hashlib.sha256(reset_bytes).hexdigest(),
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, data in (
        (_INIT, init_bytes), (_STEP, step_bytes), (_RESET, reset_bytes)
    ):
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


class ServingArtifact:
    """A loaded serving artifact: `init` once, then `step` forever.

    State is O(receptive field) and chunk output bit-matches the in-process
    streaming session of the same engine (same kernels, same RNG chain).
    """

    def __init__(self, manifest: dict, exp_init, exp_step, exp_reset):
        from ..config import _from_dict

        self.manifest = manifest
        self.arch = _from_dict(ArchConfig, manifest["arch"])
        self._init = jax.jit(exp_init.call)
        self._step = jax.jit(exp_step.call)
        self._reset = jax.jit(exp_reset.call)

    def init(self, params, seed: int):
        return self._init(params, jnp.int32(seed))

    def step(self, params, state, cond: Optional[jnp.ndarray] = None,
             lane: Optional[jnp.ndarray] = None):
        """-> (classes (B, chunk_size) int32, new state).

        per_lane artifacts take `lane`: (3, B) int32 [seeds; lease times;
        f32(1/tau) bits] — the SessionPool lane block."""
        args = [params, state]
        if self.manifest.get("per_lane"):
            if lane is None:
                raise ValueError(
                    "artifact was exported per_lane: pass lane (3, B) int32"
                )
            args.append(lane)
        elif lane is not None:
            raise ValueError("artifact was exported without per_lane")
        if self.manifest["with_cond"]:
            if cond is None:
                raise ValueError("artifact was exported with_cond: pass cond")
            args.append(cond)
        elif cond is not None:
            raise ValueError("artifact was exported without cond")
        return self._step(*args)

    def reset(self, params, state, lane_mask):
        """Continuous batching behind the export boundary: reset the
        masked lanes to a fresh t=0 session (generate.reset_lanes
        semantics — recycled lane == fresh session, bit-exact)."""
        return self._reset(
            params, state, jnp.asarray(lane_mask, jnp.bool_)
        )


def _sharded_state_specs():
    """PartitionSpecs of the TP streaming state (matches
    parallel.synthesis.ShardedSession._state_specs for turbo/mega) plus
    the absolute-time scalar."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    return {
        "bufs": P(None, None, DATA_AXIS),
        "h": P(None, DATA_AXIS),
        "e_s": P(None, DATA_AXIS),
        "seed_base": P(),
        "t": P(),
    }


def export_sharded_serving(
    params,
    arch: ArchConfig,
    batch: int,
    chunk_size: int,
    out_dir: str,
    engine: str = "mega",
    temperature: float = 1.0,
    mesh_data: int = 1,
    mesh_model: int = 2,
    with_cond: bool = False,
) -> dict:
    """Export a MODEL-SHARDED streaming session (the r4 mesh-serving tier)
    as a jax.export artifact (VERDICT r4 weak #6).

    The exported init/step/reset are the jitted shard_map programs behind
    parallel.synthesis.ShardedSession (turbo/mega engines — the skip-split
    TP step with one psum per sample): jax.export serializes them WITH
    their input/output shardings, so the loaded artifact reproduces the
    in-process sharded session bit-for-bit (tests/test_export.py). Loading
    requires a process with >= mesh_data * mesh_model devices; the loader
    rebuilds the mesh and places host params/state per the recorded specs.
    """
    import jax.numpy as _jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
    from ..parallel.synthesis import skip_sharded_param_specs
    from .. import generate as G

    if engine not in ("turbo", "mega"):
        raise ValueError(
            f"sharded artifacts cover the TP engines turbo|mega, got "
            f"{engine}"
        )
    if arch.skip_channels % mesh_model:
        raise ValueError(
            f"skip_channels ({arch.skip_channels}) % mesh_model "
            f"({mesh_model}) != 0"
        )
    if batch % mesh_data:
        raise ValueError(f"batch {batch} % mesh_data {mesh_data} != 0")
    mesh = make_mesh(mesh_data, mesh_model)
    param_specs = skip_sharded_param_specs(params)
    state_specs = _sharded_state_specs()
    shard_b = batch // mesh_data

    def init_fn(p, kd):
        def per_shard(p, kd):
            r = jax.random.wrap_key_data(kd)
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))
            stream = G.start_stream(
                arch, shard_b, r, engine=engine, params=p,
                model_axis=MODEL_AXIS,
            )
            st = dict(stream.state)
            st["t"] = stream.t
            return st

        return shard_map(
            per_shard, mesh=mesh, in_specs=(param_specs, P()),
            out_specs=state_specs, check_vma=False,
        )(p, kd)

    def step_fn(p, state, *maybe_cond):
        cond = maybe_cond[0] if with_cond else None

        def per_shard(p, st, cond_l):
            st = dict(st)
            t = st.pop("t")
            cls, ns = G.stream_chunk(
                p, arch, G.Stream(st, t), chunk_size,
                cond=cond_l if with_cond else None,
                temperature=temperature, engine=engine,
                model_axis=MODEL_AXIS,
            )
            out = dict(ns.state)
            out["t"] = ns.t
            return cls, out

        cond_spec = P(DATA_AXIS, None, None)
        fn = shard_map(
            per_shard, mesh=mesh,
            in_specs=(param_specs, state_specs, cond_spec if with_cond
                      else P()),
            out_specs=(P(DATA_AXIS, None), state_specs),
            check_vma=False,
        )
        dummy = cond if with_cond else _jnp.zeros((), _jnp.float32)
        return fn(p, state, dummy)

    def reset_fn(p, state, lane_mask):
        def per_shard(p, st, mask):
            st = dict(st)
            t = st.pop("t")
            ns = G.reset_lanes(
                p, arch, G.Stream(st, t), mask, engine=engine,
                model_axis=MODEL_AXIS,
            )
            out = dict(ns.state)
            out["t"] = ns.t
            return out

        return shard_map(
            per_shard, mesh=mesh,
            in_specs=(param_specs, state_specs, P(DATA_AXIS)),
            out_specs=state_specs, check_vma=False,
        )(p, state, lane_mask)

    def shard_struct(tree, specs):
        # Leaves may be arrays (params) or ShapeDtypeStructs (eval_shape).
        return jax.tree_util.tree_map(
            lambda a, sp: jax.ShapeDtypeStruct(
                tuple(a.shape), a.dtype,
                sharding=NamedSharding(mesh, sp),
            ),
            tree, specs,
        )

    p_spec = shard_struct(params, param_specs)
    kd = jax.random.key_data(jax.random.key(0))
    kd_spec = jax.ShapeDtypeStruct(
        kd.shape, kd.dtype, sharding=NamedSharding(mesh, P())
    )
    state_struct = jax.eval_shape(init_fn, p_spec, kd_spec)
    state_spec = shard_struct(state_struct, state_specs)
    checks = [
        jexport.DisabledSafetyCheck.custom_call(t) for t in _TPU_CUSTOM_CALLS
    ]
    exp_init = jexport.export(jax.jit(init_fn), disabled_checks=checks)(
        p_spec, kd_spec
    )
    step_args = [p_spec, state_spec]
    if with_cond:
        step_args.append(jax.ShapeDtypeStruct(
            (batch, chunk_size, arch.cond_channels),
            _jnp.dtype(arch.compute_dtype),
            sharding=NamedSharding(mesh, P(DATA_AXIS, None, None)),
        ))
    exp_step = jexport.export(jax.jit(step_fn), disabled_checks=checks)(
        *step_args
    )
    mask_spec = jax.ShapeDtypeStruct(
        (batch,), _jnp.bool_, sharding=NamedSharding(mesh, P(DATA_AXIS))
    )
    exp_reset = jexport.export(jax.jit(reset_fn), disabled_checks=checks)(
        p_spec, state_spec, mask_spec
    )

    init_bytes = exp_init.serialize()
    step_bytes = exp_step.serialize()
    reset_bytes = exp_reset.serialize()
    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "sharded": True,
        "arch": dataclasses.asdict(arch),
        "batch": batch,
        "chunk_size": chunk_size,
        "engine": engine,
        "temperature": temperature,
        "with_cond": with_cond,
        "mesh_data": mesh_data,
        "mesh_model": mesh_model,
        "platforms": list(exp_step.platforms),
        "jax_version": jax.__version__,
        "sha256": {
            _INIT: hashlib.sha256(init_bytes).hexdigest(),
            _STEP: hashlib.sha256(step_bytes).hexdigest(),
            _RESET: hashlib.sha256(reset_bytes).hexdigest(),
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, data in (
        (_INIT, init_bytes), (_STEP, step_bytes), (_RESET, reset_bytes)
    ):
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


class ShardedServingArtifact:
    """A loaded model-sharded serving artifact.

    Mirrors ServingArtifact but over a (data, model) mesh: `place_params`
    once per checkpoint, `init` once, then `step` forever. State stays
    device-resident (sharded) between calls; classes come back as a global
    (B, chunk) array sharded over `data`.
    """

    def __init__(self, manifest: dict, exp_init, exp_step, exp_reset):
        from ..config import _from_dict
        from ..parallel.mesh import make_mesh

        self.manifest = manifest
        self.arch = _from_dict(ArchConfig, manifest["arch"])
        need = manifest["mesh_data"] * manifest["mesh_model"]
        if len(jax.devices()) < need:
            raise ValueError(
                f"sharded artifact needs {need} devices "
                f"({manifest['mesh_data']}x{manifest['mesh_model']} mesh); "
                f"this process has {len(jax.devices())}"
            )
        self.mesh = make_mesh(manifest["mesh_data"], manifest["mesh_model"])
        self._init = jax.jit(exp_init.call)
        self._step = jax.jit(exp_step.call)
        self._reset = jax.jit(exp_reset.call)

    def place_params(self, params):
        """Host params pytree -> mesh-placed (skip-split) arrays."""
        from ..parallel.synthesis import (
            _place_global, skip_sharded_param_specs,
        )

        specs = skip_sharded_param_specs(params)
        return jax.tree_util.tree_map(
            lambda x, sp: _place_global(x, self.mesh, sp), params, specs
        )

    def init(self, params, seed: int):
        kd = jax.random.key_data(jax.random.key(seed))
        from jax.sharding import NamedSharding, PartitionSpec as P

        kd = jax.device_put(kd, NamedSharding(self.mesh, P()))
        return self._init(params, kd)

    def step(self, params, state, cond: Optional[jnp.ndarray] = None):
        """-> (classes (B, chunk) int32 sharded over data, new state)."""
        if self.manifest["with_cond"]:
            if cond is None:
                raise ValueError("artifact was exported with_cond: pass cond")
            from ..parallel.synthesis import _place_global
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            cond = _place_global(cond, self.mesh, P(DATA_AXIS, None, None))
            return self._step(params, state, cond)
        if cond is not None:
            raise ValueError("artifact was exported without cond")
        return self._step(params, state)

    def reset(self, params, state, lane_mask):
        from ..parallel.synthesis import _place_global
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        mask = _place_global(
            jnp.asarray(lane_mask, jnp.bool_), self.mesh, P(DATA_AXIS)
        )
        return self._reset(params, state, mask)


def load_serving(path: str) -> ServingArtifact:
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["artifact_version"] != ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {manifest['artifact_version']} != "
            f"{ARTIFACT_VERSION}"
        )
    blobs = {}
    for name in (_INIT, _STEP, _RESET):
        with open(os.path.join(path, name), "rb") as f:
            blobs[name] = f.read()
        got = hashlib.sha256(blobs[name]).hexdigest()
        want = manifest["sha256"][name]
        if got != want:
            raise ValueError(
                f"artifact {name} does not match its manifest hash "
                f"(mixed-generation directory from an interrupted "
                f"re-export?): {got[:12]} != {want[:12]}"
            )
    cls = (
        ShardedServingArtifact if manifest.get("sharded") else ServingArtifact
    )
    return cls(
        manifest,
        jexport.deserialize(blobs[_INIT]),
        jexport.deserialize(blobs[_STEP]),
        jexport.deserialize(blobs[_RESET]),
    )
