"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 "Distributed" tier: meshes are tested without TPUs via
`--xla_force_host_platform_device_count`.

Note: this image's sitecustomize imports jax and registers the `axon` TPU
plugin at interpreter startup with JAX_PLATFORMS=axon, so plain env-var
edits here are too late — jax.config has already captured the env. We
therefore override via jax.config.update BEFORE any backend is initialized
(safe: sitecustomize registers the plugin but does not create backends).
Set WAVENET_TEST_TPU=1 to run the suite on the real chip instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # Parsed lazily by the CPU PJRT client at backend creation; env edit
    # still effective here as long as no backend exists yet.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("WAVENET_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


# Full-suite stability: one pytest process accumulates ~250 tests' worth
# of live compiled executables, device buffers, and helper threads; on
# this image that state DETERMINISTICALLY segfaults XLA:CPU (libgcc
# unwind) during the 249th test's compile — standalone runs of the same
# module pass (r5 session log). Dropping the jit/executable caches
# between MODULES keeps the live-executable population bounded; the
# per-module recompiles it forces are programs each module builds anyway.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bounded_live_executables():
    yield
    import jax

    jax.clear_caches()
    gc.collect()
