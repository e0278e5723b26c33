"""Cross-engine audit-mode check (VERDICT r1 item 9, BASELINE.md row).

Measured ground truth (round 2, on-chip): the xla and pallas engines share
one sampling chain and their free-running SAMPLED streams are BIT-EXACT for
1000+ steps at DEFAULT matmul precision (and under "highest" — the knob
changes nothing for bf16-compute archs, whose kernel contractions are
already exact). The stream that DOES drift is xla ↔ mega GREEDY (first
argmax flip t=168 on an untrained wavenet30): the cause is the mega
kernel's merged-contraction accumulation order (K=2C tap concat and the
res+skip output merge round fewer times than XLA's split matmuls), which
`jax.default_matmul_precision("highest")` leaves UNCHANGED — so
`gen.matmul_precision` matters only for fp32-compute archs, where XLA's
default fp32 TPU matmul is a reduced-precision pass.

This script measures both pairs' first divergence step at default
precision and under "highest", asserting xla ↔ pallas stays exact.

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

    def gen(engine, temperature):
        return np.asarray(generate_classes(
            params, arch, rng, batch, n, temperature=temperature,
            engine=engine,
        ))

    t0 = time.perf_counter()
    # Raising jax.default_matmul_precision around a Pallas kernel injects
    # contract_precision<fp32> into its bf16 matmuls, which Mosaic rejects
    # — so only the XLA engine runs under the raised-precision context
    # (exactly what gen.matmul_precision does in the CLI); the Pallas
    # engines always run at their own (exact-contraction) precision.
    # Pair 1: xla vs pallas, SAMPLED (shared RNG chain).
    pls = gen("pallas", 1.0)
    xp_default = first_mismatch(gen("xla", 1.0), pls)
    with jax.default_matmul_precision("highest"):
        xla_hi_sampled = gen("xla", 1.0)
    xp_highest = first_mismatch(xla_hi_sampled, pls)
    # Pair 2: xla vs mega, GREEDY (mega samples in-kernel, so only the
    # deterministic stream is comparable) — the documented drifting pair
    # (ar_mega.py precision note: first argmax flip ~t=170 at default).
    mega = gen("mega", 0.0)
    xm_default = first_mismatch(gen("xla", 0.0), mega)
    with jax.default_matmul_precision("highest"):
        xla_hi_greedy = gen("xla", 0.0)
    xm_highest = first_mismatch(xla_hi_greedy, mega)
    wall = time.perf_counter() - t0

    ok = xp_highest == -1
    print(json.dumps({
        "metric": "audit_mode_divergence_step",
        "xla_vs_pallas_sampled": {
            "default": xp_default, "highest": xp_highest,
        },
        "xla_vs_mega_greedy": {
            "default": xm_default, "highest": xm_highest,
        },
        "audit_bit_exact": ok,
        "batch": batch,
        "steps": n,
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
