"""Cross-engine audit-mode check (VERDICT r1 item 9, BASELINE.md row).

The xla and pallas engines share one sampling chain and bit-match on CPU
for arbitrary lengths, but free-running TPU streams drift after ~150 steps
at the DEFAULT matmul precision (XLA's fp32 matmuls are reduced-precision
on TPU; the Pallas kernels' are exact — ops/pallas/ar_mega.py docstring).
`gen.matmul_precision="highest"` is the audit knob that removes the drift.

This script measures the first divergence step of a free-running SAMPLED
xla-vs-pallas pair at default precision, then re-runs both under
jax.default_matmul_precision("highest") and asserts full agreement.

    python scripts/audit_check.py        # AUDIT_BATCH / AUDIT_STEPS
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def first_mismatch(a, b) -> int:
    """First time step where any lane differs; -1 if none."""
    diff = (a != b).any(axis=0)
    idx = np.nonzero(diff)[0]
    return int(idx[0]) if idx.size else -1


def main() -> int:
    import jax

    plat = os.environ.get("WAVENET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _WAVENET30
    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import generate_classes
    from lb_wavenet_tpu.models.wavenet import init_params

    arch = ArchConfig(**_WAVENET30)
    batch = int(os.environ.get("AUDIT_BATCH", "128"))
    n = int(os.environ.get("AUDIT_STEPS", "1000"))
    params = jax.device_put(init_params(jax.random.key(0), arch))
    rng = jax.random.key(7)

    def pair():
        xla = np.asarray(generate_classes(
            params, arch, rng, batch, n, temperature=1.0, engine="xla"
        ))
        pls = np.asarray(generate_classes(
            params, arch, rng, batch, n, temperature=1.0, engine="pallas"
        ))
        return first_mismatch(xla, pls)

    t0 = time.perf_counter()
    drift_default = pair()
    with jax.default_matmul_precision("highest"):
        drift_highest = pair()
    wall = time.perf_counter() - t0

    ok = drift_highest == -1
    print(json.dumps({
        "metric": "audit_mode_divergence_step",
        "first_divergence_default": drift_default,
        "first_divergence_highest": drift_highest,
        "audit_bit_exact": ok,
        "batch": batch,
        "steps": n,
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
