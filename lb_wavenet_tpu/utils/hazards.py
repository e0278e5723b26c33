"""Guards for measured environment hazards (VERDICT r3 item 3).

A documented hazard that code does not enforce is half-done: these checks
turn BASELINE.md's "do not run X" rows into refusals shared by every entry
point that can reach them (bench.py, the CLI).
"""
from __future__ import annotations

import os
import sys

XLA_ENGINE_MAX_TPU_BATCH = 512  # exclusive bound; B >= this crashed 3/3


def check_xla_engine_batch(engine: str, batch: int, backend=None) -> None:
    """Refuse the documented TPU-killer cell (BASELINE.md round-3 XLA row).

    The one-shot XLA-engine synthesis program at batch >= 512 reproducibly
    crashes the TPU worker on this image (3/3 independent runs, T=4096 and
    T=2048; ~5 min backend recovery; a killed client stalls the relay for
    every later process). BENCH_FORCE=1 / WAVENET_FORCE_XLA_BATCH=1
    override for deliberate re-measurement.
    """
    if engine != "xla" or batch < XLA_ENGINE_MAX_TPU_BATCH:
        return
    if backend is None:
        import jax

        backend = jax.default_backend()
    if backend != "tpu":
        return
    if os.environ.get("BENCH_FORCE", "") == "1" or (
        os.environ.get("WAVENET_FORCE_XLA_BATCH", "") == "1"
    ):
        print(
            f"WARNING: forcing engine=xla batch={batch} on TPU — this cell "
            f"crashed the TPU worker 3/3 times (BASELINE.md round 3)",
            file=sys.stderr, flush=True,
        )
        return
    raise SystemExit(
        f"REFUSED: engine=xla at batch={batch} >= "
        f"{XLA_ENGINE_MAX_TPU_BATCH} on the TPU backend reproducibly "
        f"crashes the TPU worker on this image (BASELINE.md round-3 XLA "
        f"row; ~5 min recovery + relay stall). Use batch <= 128, another "
        f"engine, or BENCH_FORCE=1 / WAVENET_FORCE_XLA_BATCH=1 to "
        f"override knowingly."
    )
