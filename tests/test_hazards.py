"""Environment-hazard guards (VERDICT r3 item 3).

BASELINE.md round-3 XLA row documents that one-shot xla-engine synthesis at
batch >= 512 reproducibly crashes the TPU worker on this image. The guard
turns that documented hazard into a refusal at every entry point (bench.py,
`wavenet generate`); these tests pin its decision table on CPU by passing
the backend explicitly.
"""
import pytest

from lb_wavenet_tpu.utils.hazards import (
    XLA_ENGINE_MAX_TPU_BATCH,
    check_xla_engine_batch,
)


def test_refuses_xla_large_batch_on_tpu():
    with pytest.raises(SystemExit, match="REFUSED"):
        check_xla_engine_batch("xla", 512, backend="tpu")
    with pytest.raises(SystemExit, match="REFUSED"):
        check_xla_engine_batch("xla", 1536, backend="tpu")


def test_allows_safe_cells():
    # Below the crash bound on TPU.
    check_xla_engine_batch("xla", XLA_ENGINE_MAX_TPU_BATCH - 1, backend="tpu")
    check_xla_engine_batch("xla", 128, backend="tpu")
    # Fused engines are unaffected at any batch.
    for eng in ("pallas", "turbo", "mega"):
        check_xla_engine_batch(eng, 4096, backend="tpu")
    # CPU backend never refuses (the crash is a TPU-worker phenomenon).
    check_xla_engine_batch("xla", 4096, backend="cpu")


def test_force_env_overrides(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_FORCE", "1")
    check_xla_engine_batch("xla", 1024, backend="tpu")  # no raise
    assert "forcing engine=xla" in capsys.readouterr().err
    monkeypatch.delenv("BENCH_FORCE")
    monkeypatch.setenv("WAVENET_FORCE_XLA_BATCH", "1")
    check_xla_engine_batch("xla", 1024, backend="tpu")  # no raise


def test_bench_reexports_guard():
    # bench.py and the CLI share the ONE implementation.
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.check_xla_engine_batch is check_xla_engine_batch
