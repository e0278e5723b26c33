"""On-chip floor of the TP TRAIN step (VERDICT r4 item 2 done-criterion).

One real chip cannot run a real model axis, but a mesh(1, 1) shard_map
run measures the TP train path's single-chip FLOOR — the shard_map + psum
+ XLA-post formulation overhead relative to the plain fused train_step at
the same geometry (à la scripts/tp_floor_bench.py for synthesis). The
stress config (S=512) is the motivating shape. Difference timing, scalar
sync, one process.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402

if os.environ.get("WAVENET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["WAVENET_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from lb_wavenet_tpu.config import ArchConfig, TrainConfig  # noqa: E402
from lb_wavenet_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, shard_batch, shard_params,
)
from lb_wavenet_tpu.train import (  # noqa: E402
    init_state, make_tp_train_step, train_step,
)

BATCH = int(os.environ.get("TPF_BATCH", "8"))
WINDOW = int(os.environ.get("TPF_WINDOW", "4096"))
STEPS = int(os.environ.get("TPF_STEPS", "6"))

ARCH = ArchConfig(
    n_blocks=3, n_layers_per_block=10, residual_channels=64,
    skip_channels=512, gate_channels=64, compute_dtype="bfloat16",
)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    train = TrainConfig(
        batch_size=BATCH, window_size=WINDOW, fused_stack=True, tapcat=True,
        fused_frontend=True,
    )
    r = ARCH.receptive_field
    x = jax.random.randint(
        jax.random.key(1), (BATCH, r - 1 + WINDOW), 0, ARCH.quant_channels
    ).astype(np.int32)
    tgt = jax.random.randint(
        jax.random.key(2), (BATCH, WINDOW), 0, ARCH.quant_channels
    ).astype(np.int32)
    bd = {"inputs": np.asarray(x), "targets": np.asarray(tgt),
          "mask": np.ones((BATCH, WINDOW), np.float32)}

    results = {}
    for label in ("plain", "tp"):
        state = init_state(jax.random.key(0), ARCH, train)
        if label == "tp":
            mesh = make_mesh(1, 1)
            state = shard_params(state, mesh)
            step_fn = make_tp_train_step(mesh, ARCH, train)
            batch = shard_batch(dict(bd), mesh)

            def do(state):  # noqa: ANN001
                return step_fn(state, batch)
        else:
            batch = {k: jax.numpy.asarray(v) for k, v in bd.items()}

            def do(state):  # noqa: ANN001
                return train_step(state, batch, ARCH, train)

        def run(k, state):
            t0 = time.perf_counter()
            for _ in range(k):
                state, loss = do(state)
            np.asarray(loss)
            return time.perf_counter() - t0, state

        t0 = time.perf_counter()
        _, state = run(1, state)
        compile_s = time.perf_counter() - t0
        t_s = t_l = float("inf")
        for _ in range(3):
            dt, state = run(STEPS, state)
            t_s = min(t_s, dt)
            dt, state = run(2 * STEPS, state)
            t_l = min(t_l, dt)
        step_s = max(t_l - t_s, 1e-9) / STEPS
        results[label] = step_s
        print(json.dumps({
            "label": label, "step_ms": round(step_s * 1e3, 3),
            "samples_per_sec": round(BATCH * WINDOW / step_s, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    print(json.dumps({
        "tp_over_plain": round(results["tp"] / results["plain"], 4),
        "batch": BATCH, "window": WINDOW, "arch": "stress S=512",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
