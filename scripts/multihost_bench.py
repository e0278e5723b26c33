"""Multi-host scaling-efficiency harness (BASELINE north-star: >= 85 % at 2+
hosts on v5e-16).

Run one process per host:

    python scripts/multihost_bench.py --coordinator $COORD:8476 \
        --num-processes $N --process-id $ID [--mode train|generate]

Measures per-chip throughput at the current topology and prints (host 0) a
JSON line comparable across N:

    {"mode": "train", "hosts": N, "chips": C,
     "samples_per_sec_per_chip": X}     # or audio_sec_per_sec_per_chip

Scaling efficiency at N hosts = per-chip throughput at N / per-chip
throughput at 1 (data-parallel: global batch scales with chips). Single-chip
numbers for this framework are recorded in BASELINE.md.

No real multi-host slice is available in the build environment; this script
is exercised there via 2 CPU processes (tests/test_multiprocess.py covers the
same code path) and is the artifact to run on a real v5e-16.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:8476")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--mode", choices=("train", "generate"), default="train")
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument("--gen-batch-per-chip", type=int, default=256)
    ap.add_argument("--gen-samples", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax

    # Like the CLI: this image's TPU plugin force-selects the axon platform
    # (env JAX_PLATFORMS is overridden programmatically), so an explicit
    # escape hatch is needed for host-only runs — without it a "2-process
    # CPU smoke" silently becomes two standalone runs fighting over the one
    # real chip (process_count() == 1 in each).
    if os.environ.get("WAVENET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WAVENET_PLATFORM"])

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    import numpy as np

    from lb_wavenet_tpu.config import ArchConfig, TrainConfig
    from lb_wavenet_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from lb_wavenet_tpu.train import init_state, train_step

    chips = len(jax.devices())
    arch = ArchConfig(
        n_blocks=3,
        n_layers_per_block=10,
        residual_channels=64,
        skip_channels=256,
        gate_channels=64,
        n_mels=80,
        cond_channels=64,
        upsample_factors=(4, 8, 8),
    )

    if args.mode == "train":
        global_batch = args.batch_per_chip * chips
        train = TrainConfig(batch_size=global_batch, window_size=args.window)
        mesh = make_mesh(-1, 1)
        state = shard_params(init_state(jax.random.key(0), arch, train), mesh)
        rng = np.random.default_rng(jax.process_index())
        t_in = arch.receptive_field - 1 + args.window
        n_frames = -(-t_in // arch.hop_size)
        local_rows = global_batch // jax.process_count()
        local = {
            "inputs": rng.integers(0, 256, (local_rows, t_in)).astype(np.int32),
            "targets": rng.integers(0, 256, (local_rows, args.window)).astype(
                np.int32
            ),
            "mask": np.ones((local_rows, args.window), np.float32),
            "mel": rng.standard_normal((local_rows, n_frames, arch.n_mels)).astype(
                np.float32
            ),
        }
        batch = shard_batch(local, mesh)
        state, loss = train_step(state, batch, arch, train)  # compile
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = train_step(state, batch, arch, train)
        float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        per_chip = global_batch * args.window / dt / chips
        result = {
            "mode": "train",
            "hosts": jax.process_count(),
            "chips": chips,
            "step_ms": round(dt * 1000, 2),
            "samples_per_sec_per_chip": round(per_chip, 1),
        }
    else:
        from lb_wavenet_tpu.generate import generate_classes
        from lb_wavenet_tpu.models.wavenet import init_params

        # Fleet batched synthesis: every chip owns a batch shard; with the
        # model replicated this is embarrassingly parallel — per-chip batch
        # stays constant, so wall time should be flat in N.
        params = jax.device_put(init_params(jax.random.key(0), arch))
        b = args.gen_batch_per_chip
        engine = "mega" if b % 128 == 0 else "turbo"

        def run(key):
            out = generate_classes(
                params, arch, jax.random.key(key), b, args.gen_samples,
                engine=engine,
            )
            # Sync on a scalar reduction — fetching the full (B, T) class
            # array is a D2H cost that scales with T and pollutes timing
            # (the bench.py artifact; see docs/kernels.md).
            return int(np.asarray(out.astype(np.int64).sum()))

        run(0)  # compile
        t0 = time.perf_counter()
        run(1)
        dt = time.perf_counter() - t0
        per_chip = b * args.gen_samples / arch.sample_rate / dt
        result = {
            "mode": "generate",
            "hosts": jax.process_count(),
            "chips": chips,
            "engine": engine,
            "audio_sec_per_sec_per_chip": round(per_chip, 1),
        }

    if jax.process_index() == 0:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
