"""Command-line entry points: `wavenet train|generate|eval|info|export`.

Reference parity: the reference shipped `train.py` and `generate.py` argparse
CLIs driven by JSON architecture files (SURVEY.md §2.1 "CLI entry points",
"Config system"). Same surface here, one binary:

    python -m lb_wavenet_tpu.cli train    --config configs/wavenet30.json \
        --set train.data_dir=/data/wavs --set train.n_steps=100000
    python -m lb_wavenet_tpu.cli generate --config configs/wavenet30.json \
        --set gen.batch_size=256 --set gen.n_samples=48000

`--set section.key=value` overrides any config field (values parsed as JSON,
falling back to string). Multi-host: launch one process per host with
--coordinator/--num-processes/--process-id (wires jax.distributed).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        key, _, val = p.partition("=")
        if not _:
            raise SystemExit(f"--set expects section.key=value, got {p!r}")
        try:
            out[key] = json.loads(val)
        except json.JSONDecodeError:
            out[key] = val
    return out


def _load_config(args):
    from .config import Config

    cfg = Config.load(args.config) if args.config else Config()
    return cfg.override(_parse_overrides(args.set))


def _maybe_init_distributed(args):
    if args.num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )


def _add_common(p):
    p.add_argument("--config", default="", help="JSON config file")
    p.add_argument(
        "--set",
        action="append",
        metavar="SECTION.KEY=VALUE",
        help="config override (repeatable)",
    )
    p.add_argument("--coordinator", default="127.0.0.1:8476")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument(
        "--profile",
        default="",
        metavar="DIR",
        help="capture a jax.profiler trace of the hot loop into DIR",
    )


def cmd_train(args) -> int:
    cfg = _load_config(args)
    _maybe_init_distributed(args)
    from .train import run_training

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    try:
        run_training(cfg)
    finally:
        if args.profile:
            import jax

            jax.profiler.stop_trace()
    return 0


def _cond_chunk_stream(ups, cond_frames, chunk: int, batch: int, cc: int,
                       hop: int):
    """Yield (B, chunk, Cc) conditioning chunks from frame-rate mel via the
    StreamingUpsampler; the tail past the last frame is zero-padded (those
    samples are trimmed by the caller)."""
    import jax.numpy as jnp
    import numpy as np

    pending = np.zeros((batch, 0, cc), np.float32)
    fed, done = 0, False
    fpc = max(chunk // hop, 1)  # frames fed per refill
    while True:
        while pending.shape[1] < chunk and not done:
            if fed < cond_frames.shape[1]:
                out = ups.feed(cond_frames[:, fed : fed + fpc])
                fed += fpc
            else:
                out = ups.finish()
                done = True
            pending = np.concatenate([pending, np.asarray(out)], axis=1)
        if pending.shape[1] < chunk:
            pending = np.concatenate(
                [pending, np.zeros(
                    (batch, chunk - pending.shape[1], cc), np.float32
                )], axis=1,
            )
        yield jnp.asarray(pending[:, :chunk])
        pending = pending[:, chunk:]


def _generate_from_artifact(args, cfg, params, cond_frames) -> int:
    """Synthesis from an AOT serving artifact (utils/export.py): no model
    tracing — init once, step per chunk, decode, write wavs."""
    import jax
    import numpy as np

    from .data import write_wav
    from .generate import mu_law_decode
    from .utils.export import load_serving

    art = load_serving(args.artifact)
    if art.arch != cfg.arch:
        raise SystemExit(
            "artifact arch differs from --config arch; pass the config the "
            "artifact was exported with"
        )
    if args.prime or args.speakers:
        raise SystemExit(
            "--artifact bakes the session shape; --prime/--speakers need "
            "the in-process path"
        )
    m = art.manifest
    batch, chunk = m["batch"], m["chunk_size"]
    cond_gen = None
    if m["with_cond"]:
        if cond_frames is None:
            raise SystemExit("artifact was exported with_cond: pass --mel")
        if cond_frames.shape[0] != batch:
            raise SystemExit(
                f"--mel batch {cond_frames.shape[0]} != artifact batch {batch}"
            )
        total_cond = cond_frames.shape[1] * cfg.arch.hop_size
        if total_cond < cfg.gen.n_samples:
            raise SystemExit(
                f"--mel frames cover {total_cond} samples < "
                f"gen.n_samples={cfg.gen.n_samples}"
            )
        from .models.conditioning import StreamingUpsampler

        ups = StreamingUpsampler(
            params["upsampler"], cfg.arch,
            jax.numpy.dtype(cfg.arch.compute_dtype),
        )
        cond_gen = _cond_chunk_stream(
            ups, cond_frames, chunk, batch, cfg.arch.cond_channels,
            cfg.arch.hop_size,
        )
    elif cond_frames is not None:
        raise SystemExit(
            "artifact was exported WITHOUT conditioning but the config is "
            "mel-conditioned; re-export from this config (with_cond is set "
            "automatically) or generate without --artifact"
        )

    # The exported step pins the cond input dtype to the arch compute
    # dtype; the host-side chunk buffer is float32 — cast at the boundary.
    cond_dtype = jax.numpy.dtype(cfg.arch.compute_dtype)
    state = art.init(params, seed=cfg.gen.seed)
    parts, emitted = [], 0
    while emitted < cfg.gen.n_samples:
        cond_chunk = (
            next(cond_gen).astype(cond_dtype) if cond_gen is not None
            else None
        )
        classes, state = art.step(params, state, cond=cond_chunk)
        parts.append(
            np.asarray(mu_law_decode(classes, cfg.arch.quant_channels))
        )
        emitted += chunk
    wav_np = np.concatenate(parts, axis=1)[:, : cfg.gen.n_samples]

    os.makedirs(cfg.gen.out_dir, exist_ok=True)
    if jax.process_index() == 0:
        for b in range(wav_np.shape[0]):
            write_wav(
                os.path.join(cfg.gen.out_dir, f"gen_{b:04d}.wav"),
                wav_np[b],
                cfg.arch.sample_rate,
            )
        print(json.dumps({
            "generated": int(wav_np.shape[0]),
            "n_samples": int(wav_np.shape[1]),
            "out_dir": cfg.gen.out_dir,
            "artifact": args.artifact,
            "engine": m["engine"],
        }))
    return 0


def _generate_mesh(args, cfg, params, cond_frames, forced, speaker_ids) -> int:
    """Distributed synthesis over a ('data','model') mesh: multi-process /
    multi-device runs shard the GLOBAL gen.batch_size over the data axis
    (each chip synthesizes only its lanes — no replicated duplicate work),
    and --mesh-model > 1 shards the model channels over the model axis
    (GSPMD collectives inside the sample loop). Every process writes the
    wavs for its own addressable lanes."""
    import jax
    import numpy as np

    from .data import write_wav
    from .generate import mu_law_decode
    from .parallel.mesh import make_mesh
    from .parallel.synthesis import FUSED_ENGINES, mesh_generate_classes

    n_dev = jax.device_count()
    mm = args.mesh_model
    if mm < 1 or n_dev % mm:
        raise SystemExit(f"--mesh-model {mm} must divide {n_dev} devices")
    n_data = n_dev // mm
    mesh = make_mesh(n_data, mm)
    batch = cfg.gen.batch_size  # GLOBAL utterance count
    if batch % n_data:
        raise SystemExit(
            f"gen.batch_size {batch} must divide by the data axis {n_data}"
        )
    shard_b = batch // n_data
    engine = cfg.gen.engine or ("pallas" if cfg.gen.use_pallas else "")
    if mm > 1:
        # Model axis: "pallas" runs the shard_map skip-split at kernel
        # speed (one psum/step, parallel/synthesis.py); anything else
        # (incl. the whole-loop mega/turbo kernels) falls back to the
        # GSPMD-partitioned xla engine.
        if engine != "pallas":
            if engine in FUSED_ENGINES and jax.process_index() == 0:
                print(json.dumps({
                    "notice": f"engine {engine!r} keeps its whole loop "
                              "in one single-chip program; model sharding "
                              "uses 'xla' (pass --set gen.engine=pallas "
                              "for the kernel-speed skip-split path)",
                }), flush=True)
            engine = "xla"
    elif not engine:
        engine = "mega" if shard_b % 128 == 0 else "turbo"
        if cfg.gen.matmul_precision:
            engine = "xla"  # the audit knob is XLA-engine-only

    cond = None
    if cond_frames is not None:
        from .models.conditioning import upsample_cond

        # Upsampled once at the GLOBAL batch (host-replicated mel input);
        # very large fleets should stream per-host mel instead.
        cond = upsample_cond(
            params["upsampler"], cfg.arch, jax.numpy.asarray(cond_frames),
            jax.numpy.dtype(cfg.arch.compute_dtype),
        )
    classes = mesh_generate_classes(
        params,
        cfg.arch,
        jax.random.key(cfg.gen.seed),
        batch,
        cfg.gen.n_samples,
        mesh,
        engine=engine,
        cond=cond,
        speaker_ids=speaker_ids,
        forced=forced,
        temperature=cfg.gen.temperature,
        global_rng=cfg.gen.global_rng,
    )

    os.makedirs(cfg.gen.out_dir, exist_ok=True)
    written = set()
    for shard in classes.addressable_shards:
        start = shard.index[0].start or 0
        if start in written:  # model-axis replicas carry the same rows
            continue
        written.add(start)
        rows = np.asarray(mu_law_decode(
            jax.numpy.asarray(shard.data), cfg.arch.quant_channels
        ))
        for i in range(rows.shape[0]):
            write_wav(
                os.path.join(cfg.gen.out_dir, f"gen_{start + i:04d}.wav"),
                rows[i],
                cfg.arch.sample_rate,
            )
    print(json.dumps({
        "process": jax.process_index(),
        "generated_local": len(written) * shard_b,
        "lanes": sorted(written),
        "mesh": {"data": n_data, "model": mm},
        "engine": engine,
        "n_samples": int(cfg.gen.n_samples),
        "out_dir": cfg.gen.out_dir,
    }), flush=True)
    return 0


def cmd_generate(args) -> int:
    cfg = _load_config(args)
    _maybe_init_distributed(args)
    import jax
    import numpy as np

    if cfg.gen.matmul_precision:
        # Audit mode: full-precision fp32 matmuls in the XLA engine (matters
        # only for fp32-compute archs — GenConfig docstring). XLA engine
        # only: the raised-precision context would inject
        # contract_precision<fp32> into the Pallas kernels' bf16 matmuls,
        # which Mosaic rejects (their contractions are already exact).
        # Resolve the EFFECTIVE engine incl. the use_pallas legacy mapping:
        # engine="" + use_pallas=true runs the pallas kernels.
        if (cfg.gen.engine or ("pallas" if cfg.gen.use_pallas else "xla")) != "xla":
            raise SystemExit(
                "gen.matmul_precision is the XLA-engine audit knob; the "
                "Pallas engines' contractions are already full-precision — "
                'set gen.engine="xla" (scripts/audit_check.py)'
            )
        jax.config.update(
            "jax_default_matmul_precision", cfg.gen.matmul_precision
        )

    from .data import write_wav
    from .generate import generate
    from .train import init_state
    from .utils.checkpoint import restore_params

    template = init_state(jax.random.key(0), cfg.arch, cfg.train)
    params = restore_params(
        cfg.gen.checkpoint_dir, template, prefer_ema=args.ema
    )

    cond_frames = None
    if cfg.arch.use_local_cond:
        if not args.mel:
            raise SystemExit(
                "mel-conditioned arch needs --mel <npy file of (B, F, n_mels)>"
            )
        cond_frames = np.load(args.mel)

    if args.artifact:
        return _generate_from_artifact(args, cfg, params, cond_frames)

    forced = None
    if args.prime:
        from .data import load_wav
        from .ops.mulaw import mu_law_encode
        import jax.numpy as jnp

        wav_p, sr = load_wav(args.prime)
        if sr != cfg.arch.sample_rate:
            raise SystemExit(
                f"--prime sample rate {sr} != arch {cfg.arch.sample_rate}"
            )
        n_prime = min(len(wav_p), cfg.gen.n_samples)
        classes = np.asarray(
            mu_law_encode(jnp.asarray(wav_p[:n_prime]), cfg.arch.quant_channels)
        )
        forced = np.full(
            (cfg.gen.batch_size, cfg.gen.n_samples), -1, np.int32
        )
        forced[:, :n_prime] = classes[None, :]

    speaker_ids = None
    if args.speakers:
        ids = [int(x) for x in args.speakers.split(",")]
        if len(ids) == 1:
            ids = ids * cfg.gen.batch_size
        if len(ids) != cfg.gen.batch_size:
            raise SystemExit(
                f"--speakers needs 1 or {cfg.gen.batch_size} ids, got {len(ids)}"
            )
        speaker_ids = np.asarray(ids, np.int32)

    distributed = (
        jax.process_count() > 1 or args.mesh_model > 1 or args.fleet
    )
    if distributed:
        if args.stream_chunk:
            raise SystemExit(
                "--stream-chunk sessions are single-chip; drop it for "
                "mesh synthesis (or run one streaming process per chip)"
            )
        return _generate_mesh(
            args, cfg, params, cond_frames,
            forced,
            speaker_ids,
        )

    if args.profile:
        jax.profiler.start_trace(args.profile)

    streamed = bool(args.stream_chunk)
    if streamed:
        chunk = int(args.stream_chunk)
        if chunk <= 0:
            raise SystemExit(f"--stream-chunk must be positive, got {chunk}")
        if forced is not None:
            raise SystemExit(
                "--stream-chunk streams synthesis; priming needs the "
                "one-shot path"
            )
        from .generate import mu_law_decode, start_stream, stream_chunk

        ups = None
        if cond_frames is not None:
            # Streaming vocoder mode: mel frames are fed incrementally
            # through the StreamingUpsampler (fixed lookahead of
            # cond_halo_frames), and each audio chunk consumes exactly its
            # span of the resulting conditioning — the chunked output
            # bit-matches the one-shot mel path (tests/test_mel_pipeline.py).
            from .models.conditioning import StreamingUpsampler

            total_cond = cond_frames.shape[1] * cfg.arch.hop_size
            if total_cond < cfg.gen.n_samples:
                raise SystemExit(
                    f"--mel frames cover {total_cond} samples < "
                    f"gen.n_samples={cfg.gen.n_samples}"
                )
            if cond_frames.shape[0] != cfg.gen.batch_size:
                raise SystemExit(
                    f"--mel batch {cond_frames.shape[0]} != "
                    f"gen.batch_size {cfg.gen.batch_size}"
                )
            ups = StreamingUpsampler(
                params["upsampler"], cfg.arch,
                jax.numpy.dtype(cfg.arch.compute_dtype),
            )

        # Streaming engines: mega (fastest; the session is auto-padded to
        # its 128-lane multiple, pad lanes are free-running throwaways
        # sliced off below), turbo/pallas/xla (any batch).
        eng = cfg.gen.engine or ("pallas" if cfg.gen.use_pallas else "xla")
        from .generate import padded_stream_batch

        device_b = padded_stream_batch(cfg.gen.batch_size, eng)
        if device_b != cfg.gen.batch_size and jax.process_index() == 0:
            print(json.dumps({
                "padded_session_batch": device_b,
                "batch": cfg.gen.batch_size,
            }), flush=True)
        stream = start_stream(
            cfg.arch, device_b, jax.random.key(cfg.gen.seed),
            engine=eng, params=params,
        )
        parts = []
        emitted = 0
        cond_gen = (
            _cond_chunk_stream(
                ups, cond_frames, chunk, cfg.gen.batch_size,
                cfg.arch.cond_channels, cfg.arch.hop_size,
            )
            if ups is not None else None
        )
        while emitted < cfg.gen.n_samples:
            # Final chunk may overshoot n_samples: the cond tail is
            # zero-padded by the generator and those samples are trimmed
            # below (real cond covers everything kept since total_cond >=
            # n_samples).
            cond_chunk = next(cond_gen) if cond_gen is not None else None
            spk = speaker_ids
            if device_b != cfg.gen.batch_size:
                pad = device_b - cfg.gen.batch_size
                if cond_chunk is not None:
                    cond_chunk = jax.numpy.concatenate([
                        cond_chunk,
                        jax.numpy.zeros(
                            (pad,) + cond_chunk.shape[1:], cond_chunk.dtype
                        ),
                    ])
                if spk is not None:
                    spk = np.concatenate([spk, np.zeros(pad, np.int32)])
            classes, stream = stream_chunk(
                params, cfg.arch, stream, chunk,
                cond=cond_chunk,
                speaker_ids=(
                    jax.numpy.asarray(spk) if spk is not None else None
                ),
                temperature=cfg.gen.temperature,
                engine=eng,
                global_rng=cfg.gen.global_rng,
            )
            classes = classes[: cfg.gen.batch_size]  # drop pad lanes
            parts.append(
                np.asarray(mu_law_decode(classes, cfg.arch.quant_channels))
            )
            emitted += chunk
            if jax.process_index() == 0:
                print(json.dumps({"streamed_samples": emitted}), flush=True)
        wav_np = np.concatenate(parts, axis=1)[:, : cfg.gen.n_samples]
    else:
        # Documented TPU-killer cell (BASELINE.md round-3 XLA row): one-shot
        # xla-engine synthesis at batch >= 512 crashes the TPU worker on
        # this image. Shared guard with bench.py; WAVENET_FORCE_XLA_BATCH=1
        # overrides.
        from .utils.hazards import check_xla_engine_batch

        check_xla_engine_batch(
            cfg.gen.engine or ("pallas" if cfg.gen.use_pallas else "xla"),
            cfg.gen.batch_size,
        )
        wav = generate(
            params,
            cfg.arch,
            jax.random.key(cfg.gen.seed),
            batch=cfg.gen.batch_size,
            n_samples=cfg.gen.n_samples,
            cond_frames=cond_frames,
            speaker_ids=speaker_ids,
            forced=forced,
            temperature=cfg.gen.temperature,
            use_pallas=cfg.gen.use_pallas,
            engine=cfg.gen.engine or None,
            global_rng=cfg.gen.global_rng,
        )
        wav_np = np.asarray(wav)  # also the reliable device sync on axon

    if args.profile:
        jax.profiler.stop_trace()

    os.makedirs(cfg.gen.out_dir, exist_ok=True)
    if jax.process_index() == 0:
        for b in range(wav_np.shape[0]):
            write_wav(
                os.path.join(cfg.gen.out_dir, f"gen_{b:04d}.wav"),
                wav_np[b],
                cfg.arch.sample_rate,
            )
        summary = {
            "generated": int(wav_np.shape[0]),
            "n_samples": int(wav_np.shape[1]),
            "out_dir": cfg.gen.out_dir,
        }
        if streamed:
            summary["streamed"] = True
        print(json.dumps(summary))
    return 0


def cmd_eval(args) -> int:
    """Held-out teacher-forced evaluation (eval.py) from a checkpoint."""
    cfg = _load_config(args)
    _maybe_init_distributed(args)
    import jax

    from .data import load_corpus
    from .eval import evaluate
    from .train import init_state
    from .utils.checkpoint import restore_params

    template = init_state(jax.random.key(0), cfg.arch, cfg.train)
    params = restore_params(
        cfg.gen.checkpoint_dir, template, prefer_ema=args.ema
    )
    data_dir = args.data_dir or cfg.train.eval_dir or cfg.train.data_dir
    if not data_dir:
        raise SystemExit("eval needs --data-dir or train.eval_dir/data_dir")
    corpus = load_corpus(data_dir, cfg.arch, cfg.train.window_size)
    batch = cfg.train.eval_batch_size or cfg.train.batch_size
    metrics = evaluate(
        params,
        cfg.arch,
        corpus,
        batch,
        max_batches=cfg.train.eval_batches,
    )
    if jax.process_index() == 0:
        print(json.dumps(metrics))
    return 0


def cmd_info(args) -> int:
    """Arch/config introspection: geometry, param count, AR roofline."""
    cfg = _load_config(args)
    import jax
    import numpy as np

    from .models.wavenet import init_params
    from .utils.profiling import (
        ar_step_speed_of_light,
        train_step_speed_of_light,
    )

    arch = cfg.arch
    shapes = jax.eval_shape(
        lambda k: init_params(k, arch), jax.random.key(0)
    )
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes)
    )
    sol = ar_step_speed_of_light(arch, cfg.gen.batch_size)
    print(
        json.dumps(
            {
                "layers": len(arch.dilations),
                "dilations": f"{arch.n_blocks}x[1..{max(arch.dilations)}]",
                "receptive_field": arch.receptive_field,
                "receptive_field_ms": round(
                    1000.0 * arch.receptive_field / arch.sample_rate, 2
                ),
                "hop_size": arch.hop_size,
                "local_cond": arch.use_local_cond,
                "global_cond": arch.use_global_cond,
                "n_params": n_params,
                "param_mb": round(n_params * 4 / 2**20, 2),
                "train_flops_per_sample": int(6 * n_params),  # fwd+bwd approx
                "gen_batch": cfg.gen.batch_size,
                "ar_speed_of_light": {
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in sol.items()
                },
                "train_speed_of_light": {
                    k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in train_step_speed_of_light(
                        arch, cfg.train.batch_size, cfg.train.window_size,
                        tapcat=cfg.train.tapcat,
                    ).items()
                },
            }
        )
    )
    return 0


def cmd_pack(args) -> int:
    """Pack a wav corpus into the out-of-core mmap format (pack.py).

    Training then points train.data_dir at the pack FILE: windows are
    assembled straight from the mmap (native uint8 assembler), so host RSS
    stays O(batch) for 100h+ corpora. --with-waves stores the float
    waveform section mel-conditioned configs need (4x larger pack)."""
    cfg = _load_config(args)
    from .pack import pack_corpus

    with_waves = args.with_waves or cfg.arch.use_local_cond
    header = pack_corpus(
        args.data_dir or cfg.train.data_dir,
        args.out,
        quant_channels=cfg.arch.quant_channels,
        sample_rate=cfg.arch.sample_rate,
        with_waves=with_waves,
        n_speakers=cfg.arch.n_speakers,
    )
    print(json.dumps({
        "pack": args.out,
        "n_files": header["n_files"],
        "n_samples": header["n_samples"],
        "hours": round(
            header["n_samples"] / cfg.arch.sample_rate / 3600.0, 3
        ),
        "enc_dtype": header["enc_dtype"],
        "with_waves": header["with_waves"],
        "bytes": os.path.getsize(args.out),
        "speakers": len(header.get("speaker_names") or []) or None,
    }))
    return 0


def cmd_export(args) -> int:
    """Export an AOT serving artifact (utils/export.py)."""
    cfg = _load_config(args)
    import jax

    from .models.wavenet import init_params
    from .utils.export import export_serving

    params = init_params(jax.random.key(0), cfg.arch)
    batch = args.batch or cfg.gen.batch_size
    if args.per_lane and args.mesh_model > 1:
        raise SystemExit("--per-lane is for single-device pool artifacts")
    if args.mesh_model > 1:
        from .parallel.mesh import make_mesh
        from .utils.export import export_sharded_serving

        n_dev = len(jax.devices())
        if n_dev % args.mesh_model:
            raise SystemExit(
                f"--mesh-model {args.mesh_model} must divide {n_dev} devices"
            )
        mesh_data = n_dev // args.mesh_model
        manifest = export_sharded_serving(
            params, cfg.arch, batch=batch, chunk_size=args.chunk,
            out_dir=args.out, engine=args.engine,
            temperature=cfg.gen.temperature,
            mesh_data=mesh_data, mesh_model=args.mesh_model,
            with_cond=cfg.arch.use_local_cond,
        )
        print(json.dumps({"exported": args.out, **{
            k: manifest[k] for k in (
                "engine", "batch", "chunk_size", "with_cond", "mesh_data",
                "mesh_model",
            )
        }}))
        return 0
    if args.engine == "mega" and batch % 128 != 0:
        raise SystemExit(
            f"--engine mega needs batch % 128 == 0 (got {batch}); pass "
            "--batch <multiple of 128> or --engine pallas"
        )
    if args.engine in ("pallas", "mega") and jax.default_backend() == "cpu":
        print(
            "warning: exporting a Pallas-engine artifact on the CPU backend "
            "produces an interpret-mode artifact that cannot serve on TPU; "
            "export on a TPU host for deployment",
            file=sys.stderr,
        )
    if args.per_lane and cfg.gen.temperature <= 0.0:
        raise SystemExit(
            "--per-lane needs gen.temperature > 0 (greedy lanes are "
            "inverse-temperature 0 at serve time)"
        )
    manifest = export_serving(
        params,
        cfg.arch,
        batch=batch,
        chunk_size=args.chunk,
        out_dir=args.out,
        engine=args.engine,
        temperature=cfg.gen.temperature,
        with_cond=cfg.arch.use_local_cond,
        per_lane=args.per_lane,
    )
    print(json.dumps({"exported": args.out, **{
        k: manifest[k] for k in (
            "engine", "batch", "chunk_size", "with_cond", "per_lane",
            "platforms",
        )
    }}))
    return 0


def cmd_serve(args) -> int:
    """Continuous-batching request server (serving.SessionPool): replay a
    requests JSONL through ONE fixed-shape streaming batch — finished lanes
    are recycled in place — writing each request's wav as it completes."""
    cfg = _load_config(args)
    import re

    import jax
    import numpy as np

    if cfg.gen.matmul_precision:
        if cfg.gen.engine != "xla":  # serve defaults to mega
            raise SystemExit(
                "gen.matmul_precision is the XLA-engine audit knob; set "
                'gen.engine="xla" (the Pallas engines are already exact)'
            )
        jax.config.update(
            "jax_default_matmul_precision", cfg.gen.matmul_precision
        )

    from .data import write_wav
    from .generate import mu_law_decode
    from .serving import SessionPool
    from .train import init_state
    from .utils.checkpoint import restore_params

    template = init_state(jax.random.key(0), cfg.arch, cfg.train)
    params = restore_params(
        cfg.gen.checkpoint_dir, template, prefer_ema=args.ema
    )

    if args.listen and args.requests:
        raise SystemExit("pass --requests FILE or --listen HOST:PORT, not both")
    if not args.listen and not args.requests:
        raise SystemExit("pass --requests FILE (batch) or --listen "
                         "HOST:PORT (online daemon)")
    if args.listen and args.deliver == "request":
        # Request-mode ring capacity is sized from the batch file's longest
        # request; an online daemon has no such bound up front.
        raise SystemExit("--listen serves with chunk delivery; drop "
                         "--deliver request")

    def _request_lines(path):
        with open(path) as f:
            for ln, line in enumerate(f, 1):
                yield ln, line

    requests = []
    seen = set()
    seen_safe: dict = {}
    if args.requests:
        for ln, line in _request_lines(args.requests):
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
                rid, n = str(r["id"]), int(r["n_samples"])
                seed = int(r["seed"]) if "seed" in r else None
                temp = (
                    float(r["temperature"]) if "temperature" in r else None
                )
            except (json.JSONDecodeError, KeyError, ValueError) as e:
                raise SystemExit(f"{args.requests}:{ln}: {e}")
            if temp is not None and temp < 0:
                raise SystemExit(
                    f"{args.requests}:{ln}: temperature must be >= 0"
                )
            if rid in seen:
                raise SystemExit(f"{args.requests}:{ln}: duplicate id {rid!r}")
            seen.add(rid)
            # Output paths are built from the SANITIZED id, so distinct raw
            # ids that sanitize identically (e.g. "a/b" vs "a_b") would
            # silently overwrite each other's wav — reject those too.
            safe = re.sub(r"[^A-Za-z0-9._-]", "_", rid)
            if safe in seen_safe:
                raise SystemExit(
                    f"{args.requests}:{ln}: id {rid!r} collides with "
                    f"{seen_safe[safe]!r} after filename sanitization "
                    f"({safe}.wav)"
                )
            seen_safe[safe] = rid
            mel = r.get("mel")
            if cfg.arch.use_local_cond and not mel:
                raise SystemExit(
                    f"{args.requests}:{ln}: mel-conditioned arch — each "
                    'request needs "mel": "<frames.npy>" ((F, n_mels), '
                    f"F * hop_size >= n_samples)"
                )
            if mel and not cfg.arch.use_local_cond:
                raise SystemExit(
                    f"{args.requests}:{ln}: request has mel but the arch "
                    "is not mel-conditioned (arch.n_mels == 0)"
                )
            if seed is not None and cfg.gen.global_rng:
                raise SystemExit(
                    f"{args.requests}:{ln}: per-request seeds need the "
                    "per-lane sampling default (gen.global_rng=false)"
                )
            if temp is not None and (
                cfg.gen.global_rng or cfg.gen.temperature <= 0
            ):
                raise SystemExit(
                    f"{args.requests}:{ln}: per-request temperature needs "
                    "the per-lane sampling default (gen.global_rng=false) "
                    "and a sampled pool (gen.temperature > 0)"
                )
            requests.append((rid, n, r.get("speaker"), mel, seed, temp))
    if args.requests and not requests:
        raise SystemExit(f"{args.requests}: no requests")

    def make_cond_fn(mel_path: str, n_samples: int, ln: str):
        """Per-request conditioning: load (F, n_mels) frames, upsample ONCE
        to sample rate (frame count bucketed so the upsampler compiles a
        bounded set of shapes), and serve slices to the pool's cond_fn."""
        import jax.numpy as jnp

        from .models.conditioning import upsample_cond

        frames = np.load(mel_path)
        if frames.ndim != 2 or frames.shape[1] != cfg.arch.n_mels:
            raise SystemExit(
                f"{ln}: mel {mel_path} has shape {frames.shape}, expected "
                f"(F, {cfg.arch.n_mels})"
            )
        hop = cfg.arch.hop_size
        if frames.shape[0] * hop < n_samples:
            raise SystemExit(
                f"{ln}: mel {mel_path} covers {frames.shape[0] * hop} "
                f"samples < n_samples={n_samples}"
            )
        f_bucket = -(-frames.shape[0] // 32) * 32
        padded = np.zeros((1, f_bucket, cfg.arch.n_mels), np.float32)
        padded[0, : frames.shape[0]] = frames
        cond = np.asarray(upsample_cond(
            params["upsampler"], cfg.arch, jnp.asarray(padded),
            jnp.dtype(cfg.arch.compute_dtype),
        )[0], np.float32)[: n_samples]

        def cond_fn(t_local: int, n: int):
            return cond[t_local : t_local + n]

        return cond_fn

    chunk = args.stream_chunk or 1024
    # Mega serves ANY pool size now (SessionPool auto-pads the device
    # session to the 128-lane multiple); gen.engine overrides.
    engine = cfg.gen.engine or "mega"
    art = None
    if args.artifact:
        # Serve a FROZEN per-lane artifact (r5): engine/chunk come from
        # the manifest; params still come from the checkpoint (weights
        # are not baked into artifacts).
        from .utils.export import load_serving

        art = load_serving(args.artifact)
        if not art.manifest.get("per_lane"):
            raise SystemExit(
                f"{args.artifact}: pool serving needs a per-lane artifact "
                "(re-export with `wavenet export --per-lane`)"
            )
        if art.arch != cfg.arch:
            raise SystemExit(
                f"{args.artifact}: artifact arch does not match the "
                "configured arch"
            )
        if args.mesh_model > 1:
            raise SystemExit("--artifact pools are single-device")
        if cfg.gen.global_rng:
            raise SystemExit(
                "--artifact pools use per-lane sampling "
                "(gen.global_rng=false)"
            )
        if cfg.gen.temperature <= 0.0:
            raise SystemExit(
                "--artifact pools need gen.temperature > 0 (greedy "
                'requests are "temperature": 0 submits)'
            )
        if args.stream_chunk and args.stream_chunk != art.manifest[
                "chunk_size"]:
            raise SystemExit(
                f"--stream-chunk {args.stream_chunk} != artifact chunk "
                f"{art.manifest['chunk_size']}"
            )
        chunk = int(art.manifest["chunk_size"])
        engine = art.manifest["engine"]
    mesh = None
    if args.mesh_model > 1:
        # Model-sharded pool (r4): skip-split TP sessions under shard_map.
        from .parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % args.mesh_model:
            raise SystemExit(
                f"--mesh-model {args.mesh_model} must divide {n_dev} devices"
            )
        mesh = make_mesh(n_dev // args.mesh_model, args.mesh_model)
        if cfg.gen.global_rng and cfg.gen.temperature > 0:
            raise SystemExit(
                "mesh serving needs the per-lane sampling default "
                "(gen.global_rng=false) or temperature 0"
            )
    acc = 0
    if args.deliver == "request":
        # Ring capacity: the longest request plus two chunks of slack
        # (see SessionPool.submit), rounded to the chunk multiple.
        max_n = max(r[1] for r in requests)
        acc = max(-(-(max_n + 2 * chunk) // chunk) * chunk, 4 * chunk)
    pool = SessionPool(
        params, cfg.arch, cfg.gen.batch_size,
        cfg.gen.seed if art is not None else jax.random.key(cfg.gen.seed),
        engine=engine, chunk_size=chunk,
        temperature=cfg.gen.temperature,
        mesh=mesh,
        artifact=art,
        deliver=args.deliver,
        **({"acc_samples": acc} if acc else {}),
        # Replayable per-request sampling is the default; gen.global_rng
        # opts the pool out to the session-global chain.
        per_lane_rng=not cfg.gen.global_rng,
        # Double-buffered dispatch/delivery (bit-identical output), ON by
        # default since round 3: with uint8 delivery the relay no longer
        # head-of-line-blocks (p99 77.7 vs serial 74.9 ms; round-2's
        # multi-second p99 stalls were the 4x-larger int32 payload), and
        # the overlap is a 1.43x wall win (569 vs 398 delivered
        # audio-sec/sec, BASELINE.md round-3). --no-pipeline reverts.
        pipeline=args.pipeline,
    )

    if args.listen:
        # Online daemon (r5): HTTP front end over the SAME pool — handlers
        # enqueue and wait; one worker thread steps the pool (server.py).
        from .server import PoolServer, make_http_server

        host, _, port_s = args.listen.rpartition(":")
        host = host or "127.0.0.1"
        try:
            port = int(port_s)
        except ValueError:
            raise SystemExit(f"--listen expects HOST:PORT, got {args.listen!r}")
        cond_builder = None
        if cfg.arch.use_local_cond:
            def cond_builder(mel_path, n_samples):
                return make_cond_fn(mel_path, n_samples, f"mel {mel_path}")
        pool_server = PoolServer(pool)
        pool_server.start()
        httpd = make_http_server(
            pool_server, cfg.arch, host, port,
            cond_builder=cond_builder,
            request_timeout=args.request_timeout,
        )
        bound = httpd.server_address
        print(json.dumps({
            "listening": f"{bound[0]}:{bound[1]}", "engine": engine,
            "batch": cfg.gen.batch_size, "chunk": chunk,
        }), flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
            pool_server.stop()
        return 0

    os.makedirs(cfg.gen.out_dir, exist_ok=True)

    next_req = 0
    parts: dict = {}
    used_seed: dict = {}

    def fill():
        nonlocal next_req
        while next_req < len(requests):
            rid, n, spk, mel, seed, temp = requests[next_req]
            if seed is None and pool.per_lane_rng:
                # Deterministic per-request seed, LOGGED on completion so
                # any served request can be bit-replayed on a dedicated
                # session (per-lane sampling contract, docs/serving.md).
                seed = (
                    cfg.gen.seed * 0x9E3779B1 + next_req
                ) & 0x7FFFFFFF
            cond_fn = (
                make_cond_fn(mel, n, f"request {rid}") if mel else None
            )
            if not pool.submit(
                rid, n, speaker=spk, cond_fn=cond_fn,
                seed=seed if pool.per_lane_rng else None,
                temperature=temp,
            ):
                break
            parts[rid] = []
            used_seed[rid] = seed
            next_req += 1

    import time as _time

    t0 = _time.perf_counter()
    fill()
    n_done = 0
    while pool.active or next_req < len(requests):
        for rid, (classes, done) in pool.step().items():
            parts[rid].append(classes)
            if done:
                wav = np.asarray(mu_law_decode(
                    jax.numpy.asarray(np.concatenate(parts.pop(rid))),
                    cfg.arch.quant_channels,
                ))
                safe = re.sub(r"[^A-Za-z0-9._-]", "_", rid)
                path = os.path.join(cfg.gen.out_dir, f"{safe}.wav")
                write_wav(path, wav, cfg.arch.sample_rate)
                n_done += 1
                rec = {"done": rid, "n_samples": int(len(wav)), "wav": path}
                if used_seed.get(rid) is not None:
                    rec["seed"] = int(used_seed[rid])
                print(json.dumps(rec))
        fill()
    wall = _time.perf_counter() - t0
    total = sum(r[1] for r in requests)
    nst = max(pool.stats["steps"], 1)
    print(json.dumps({
        "served": n_done,
        "audio_sec": round(total / cfg.arch.sample_rate, 2),
        "wall_s": round(wall, 2),
        "engine": engine,
        "batch": cfg.gen.batch_size,
        "chunk": chunk,
        "out_dir": cfg.gen.out_dir,
        # Where each serving step's wall went (SessionPool's built-in
        # cumulative phase timers): 'fetch' is the device wait + D2H,
        # the rest is host-side bookkeeping.
        "phase_ms_per_step": {
            k[:-2]: round(1000.0 * v / nst, 2)
            for k, v in pool.stats.items() if k.endswith("_s")
        },
    }))
    return 0


def cmd_warm(args) -> int:
    """Precompile the configured executables into the persistent compile
    cache (cold-start story: remote TPU compiles take seconds-to-minutes;
    a deploy can run `wavenet warm --config prod.json` once — AOT
    lower+compile, no data, no checkpoint, nothing executed — and every
    later train/generate/serve start is a cache hit)."""
    cfg = _load_config(args)
    import time

    import jax

    from .generate import Stream, _generate_classes_jit, start_stream
    from .models.wavenet import init_params
    from .train import init_state, train_step

    arch, train, gen = cfg.arch, cfg.train, cfg.gen
    warmed = []

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        warmed.append({"target": name, "s": round(time.perf_counter() - t0, 1)})
        print(json.dumps(warmed[-1]), flush=True)

    f32 = jax.ShapeDtypeStruct
    key_s = jax.eval_shape(lambda: jax.random.key(0))
    params_s = jax.eval_shape(
        lambda: init_params(jax.random.key(0), arch)
    )

    # Training step at the configured batch/window (incl. fused/accum/SP
    # knobs — they are static fields of `train`, so the traced executable
    # is exactly the production one).
    if not args.skip_train:
        state_s = jax.eval_shape(
            lambda: init_state(jax.random.key(0), arch, train)
        )
        b, w = train.batch_size, train.window_size
        t_in = arch.receptive_field - 1 + w
        import numpy as np

        batch_s = {
            "inputs": f32((b, t_in), np.int32),
            "targets": f32((b, w), np.int32),
            "mask": f32((b, w), np.float32),
        }
        if arch.use_local_cond:
            batch_s["mel"] = f32(
                (b, -(-t_in // arch.hop_size), arch.n_mels), np.float32
            )
        if arch.use_global_cond:
            batch_s["speaker"] = f32((b,), np.int32)
        timed(
            "train_step",
            lambda: train_step.lower(state_s, batch_s, arch, train).compile(),
        )

    # One-shot generation at the configured gen shape/engine.
    engine = gen.engine or ("pallas" if gen.use_pallas else "xla")
    if not args.skip_generate:
        timed(
            f"generate[{engine}]",
            lambda: _generate_classes_jit.lower(
                params_s, arch, key_s, gen.batch_size, gen.n_samples,
                None, None, None, gen.temperature, False, False, engine,
                mega_vmem_d=1, mega_pad_test=1, global_rng=gen.global_rng,
            ).compile(),
        )

    # Streaming/serving step at --stream-chunk (covers `wavenet serve` and
    # `generate --stream-chunk`; reset_lanes compiles in milliseconds at
    # first use, so the chunk step is the whole cold-start). The two
    # consumers resolve different DEFAULT engines — serve runs 'mega',
    # generate --stream-chunk runs the xla/use_pallas ladder — so with
    # gen.engine unset BOTH are warmed (an explicit gen.engine warms one).
    if args.stream_chunk:
        from .generate import padded_stream_batch, stream_chunk

        stream_engines = [gen.engine] if gen.engine else list(
            dict.fromkeys(["mega", engine])
        )
        for s_eng in stream_engines:
            device_b = padded_stream_batch(gen.batch_size, s_eng)
            stream_s = jax.eval_shape(
                lambda p, e=s_eng, b=device_b: start_stream(
                    arch, b, jax.random.key(0), engine=e, params=p
                ),
                params_s,
            )
            timed(
                f"stream_chunk[{s_eng}]x{args.stream_chunk}",
                lambda e=s_eng, ss=stream_s: stream_chunk.lower(
                    params_s, arch, ss, int(args.stream_chunk),
                    temperature=gen.temperature, engine=e,
                    global_rng=gen.global_rng,
                ).compile(),
            )

    print(json.dumps({
        "warmed": warmed,
        "cache_dir": jax.config.jax_compilation_cache_dir,
        "backend": jax.default_backend(),
    }))
    return 0


def main(argv=None) -> int:
    # This image's sitecustomize force-selects the axon TPU platform
    # programmatically (env JAX_PLATFORMS is overridden); WAVENET_PLATFORM
    # provides an explicit escape hatch (e.g. =cpu for host-only runs).
    import jax

    if os.environ.get("WAVENET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WAVENET_PLATFORM"])
    # Persistent compilation cache (remote TPU compiles are expensive).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVENET_COMPILE_CACHE", "/root/.cache/jax"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    parser = argparse.ArgumentParser(prog="wavenet", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_train = sub.add_parser("train", help="teacher-forced training")
    _add_common(p_train)
    p_gen = sub.add_parser("generate", help="batched AR synthesis")
    _add_common(p_gen)
    p_gen.add_argument(
        "--ema",
        action="store_true",
        help="restore the EMA params from the checkpoint (ema_decay runs)",
    )
    p_gen.add_argument("--mel", default="", help=".npy mel frames (B, F, n_mels)")
    p_gen.add_argument(
        "--artifact",
        default="",
        metavar="DIR",
        help="synthesize via an AOT serving artifact (wavenet export) "
        "instead of tracing the model; batch/chunk/engine come from its "
        "manifest",
    )
    p_gen.add_argument(
        "--prime",
        default="",
        help="wav file whose samples prime the generator (the reference's "
        "primed-queue mode): synthesis continues past the recording",
    )
    p_gen.add_argument(
        "--speakers",
        default="",
        help="comma-separated speaker ids (global conditioning), one per "
        "batch lane or a single id broadcast",
    )
    p_gen.add_argument(
        "--fleet",
        action="store_true",
        help="shard gen.batch_size over ALL local devices (the data axis); "
        "implied when --num-processes > 1 — multi-process generate shards "
        "the batch instead of duplicating it, each process writing its own "
        "lanes' wavs",
    )
    p_gen.add_argument(
        "--mesh-model",
        type=int,
        default=1,
        metavar="N",
        help="shard the model channels over an N-way model mesh axis "
        "(GSPMD, xla engine) for models larger than one chip; composes "
        "with the data-axis batch shard",
    )
    p_gen.add_argument(
        "--stream-chunk",
        default=0,
        type=int,
        help="emit audio incrementally in chunks of this many samples "
        "(streaming session; chunked output bit-matches one-shot)",
    )
    p_eval = sub.add_parser(
        "eval", help="held-out teacher-forced metrics from a checkpoint"
    )
    _add_common(p_eval)
    p_eval.add_argument(
        "--data-dir",
        default="",
        help="wav dir to evaluate (default: train.eval_dir or data_dir)",
    )
    p_eval.add_argument(
        "--ema",
        action="store_true",
        help="evaluate the EMA params from the checkpoint",
    )
    p_info = sub.add_parser(
        "info", help="arch/config introspection (geometry, params, roofline)"
    )
    _add_common(p_info)
    p_serve = sub.add_parser(
        "serve",
        help="continuous-batching request server over one streaming batch",
    )
    _add_common(p_serve)
    p_serve.add_argument(
        "--artifact", default=None,
        help="serve a FROZEN jax.export artifact directory (from `wavenet "
        "export --per-lane`) instead of tracing model code: engine/chunk "
        "come from the manifest, weights from gen.checkpoint_dir (r5)",
    )
    p_serve.add_argument(
        "--listen", default=None, metavar="HOST:PORT",
        help="run as an ONLINE daemon instead of replaying a batch file: "
        "POST /synthesize {n_samples[, seed][, temperature][, speaker]"
        "[, mel_path][, format: wav|classes]} -> audio/wav; GET /healthz "
        "-> pool stats (server.py; r5)",
    )
    p_serve.add_argument(
        "--request-timeout", default=600.0, type=float,
        help="--listen: seconds a handler waits for synthesis (504 after)",
    )
    p_serve.add_argument(
        "--requests", default=None,
        help='JSONL of {"id": ..., "n_samples": N[, "speaker": S]'
        '[, "mel": "frames.npy"][, "seed": N][, "temperature": T]} '
        'requests; "mel" is required '
        "per request on mel-conditioned archs ((F, n_mels) frames, F * "
        'hop_size >= n_samples); "seed" pins the per-lane sampling seed '
        "(defaults to a deterministic derivation, logged on completion "
        "for bit-replay)",
    )
    p_serve.add_argument(
        "--ema", action="store_true",
        help="restore the EMA params from the checkpoint",
    )
    p_serve.add_argument(
        "--stream-chunk", default=0, type=int,
        help="samples emitted per pool step (default 1024)",
    )
    p_serve.add_argument(
        "--pipeline", action=argparse.BooleanOptionalAction, default=True,
        help="double-buffer the serving loop (dispatch chunk t+1 while "
        "delivering chunk t; bit-identical output; ON by default — "
        "--no-pipeline serializes dispatch and delivery)",
    )
    p_serve.add_argument(
        "--mesh-model", default=1, type=int,
        help="model-axis size: shard the pool's model over N chips "
        "(skip-split TP sessions at kernel speed — a model too big for "
        "one chip can serve; r4)",
    )
    p_serve.add_argument(
        "--deliver", choices=("chunk", "request"), default="chunk",
        help="'request' (r4): accumulate classes in a device-side uint8 "
        "time ring and fetch each request ONCE at completion — no per-step "
        "device-to-host fetch (the relay-bound serving cost); output "
        "bit-identical to chunk delivery",
    )
    p_warm = sub.add_parser(
        "warm",
        help="precompile the configured executables into the persistent "
        "compile cache (deploy-time cold-start elimination)",
    )
    _add_common(p_warm)
    p_warm.add_argument("--skip-train", action="store_true")
    p_warm.add_argument("--skip-generate", action="store_true")
    p_warm.add_argument(
        "--stream-chunk", default=0, type=int,
        help="also warm the streaming/serving chunk step at this size",
    )
    p_export = sub.add_parser(
        "export", help="export an AOT serving artifact (jax.export)"
    )
    _add_common(p_export)
    p_export.add_argument("--out", required=True, help="artifact directory")
    p_export.add_argument(
        "--engine", default="mega",
        choices=["xla", "pallas", "turbo", "mega"],
    )
    p_export.add_argument(
        "--mesh-model", type=int, default=1,
        help="export a MODEL-SHARDED session artifact over a "
        "(devices/mesh_model, mesh_model) mesh (turbo/mega engines)",
    )
    p_export.add_argument(
        "--batch", type=int, default=0, help="session batch (default gen.batch_size)"
    )
    p_export.add_argument(
        "--chunk", type=int, default=4096, help="samples per step call"
    )
    p_export.add_argument(
        "--per-lane", action="store_true",
        help="add the (3, B) per-lane block (seeds / lease times / "
        "1/tau bits) to the exported step, so `wavenet serve --artifact` "
        "can pool this artifact with per-request seed/temperature (r5)",
    )
    p_pack = sub.add_parser(
        "pack", help="pack a wav corpus into the out-of-core mmap format"
    )
    _add_common(p_pack)
    p_pack.add_argument(
        "--data-dir", default="",
        help="wav dir to pack (default: train.data_dir)",
    )
    p_pack.add_argument("--out", required=True, help="output pack file")
    p_pack.add_argument(
        "--with-waves", action="store_true",
        help="store float waveforms too (forced on for mel configs)",
    )
    args = parser.parse_args(argv)
    return {
        "train": cmd_train,
        "generate": cmd_generate,
        "eval": cmd_eval,
        "info": cmd_info,
        "export": cmd_export,
        "serve": cmd_serve,
        "warm": cmd_warm,
        "pack": cmd_pack,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
