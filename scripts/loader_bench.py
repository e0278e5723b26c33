"""Input-pipeline benchmark: native C++ IO tier vs the Python loader.

Measures (1) corpus INGEST (wav parse + mu-law encode) in audio-seconds
ingested per wall-clock second, and (2) per-step window ASSEMBLY in
samples/sec at the production training shape — each with the native tier on
and off. Run on the host (no TPU needed):

    python scripts/loader_bench.py

Numbers land in BASELINE.md's measured table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from lb_wavenet_tpu import data, native
from lb_wavenet_tpu.config import ArchConfig, TrainConfig


def bench_ingest(tmpdir: str, arch: ArchConfig, n_files=64, secs=10) -> dict:
    rng = np.random.default_rng(0)
    sr = arch.sample_rate
    for i in range(n_files):
        pcm = (np.clip(rng.standard_normal(sr * secs), -3, 3) * 9000).astype(
            np.int16
        )
        data.write_wav(os.path.join(tmpdir, f"f{i:03d}.wav"),
                       pcm.astype(np.float32) / 32768.0, sr)
    audio_sec = n_files * secs
    out = {"audio_sec": audio_sec}
    for label, env in [("native", "1"), ("python", "0")]:
        os.environ["WAVENET_NATIVE_LOADER"] = env
        t0 = time.perf_counter()
        c = data.Corpus.from_dir(tmpdir, arch, window_size=6144)
        dt = time.perf_counter() - t0
        out[label] = {
            "ingest_s": round(dt, 3),
            "audio_sec_per_sec": round(audio_sec / dt, 1),
        }
        del c
    return out


def bench_assembly(arch: ArchConfig, batch=256, window=6144, reps=20) -> dict:
    corpus = data.synthetic_corpus(arch, window, n_files=32, file_len=160000)
    train = TrainConfig(batch_size=batch, window_size=window, seed=0)
    out = {"batch": batch, "window": window}
    for label, env in [("native", "1"), ("python", "0")]:
        os.environ["WAVENET_NATIVE_LOADER"] = env
        it = data.make_batches(corpus, train)
        next(it)  # warm (also builds the packed corpus / .so)
        t0 = time.perf_counter()
        for _ in range(reps):
            next(it)
        dt = (time.perf_counter() - t0) / reps
        out[label] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "samples_per_sec": round(batch * window / dt / 1e6, 2),
        }
    return out


def main():
    import json
    import tempfile

    from bench import _WAVENET30  # the one shared production geometry

    arch = ArchConfig(**_WAVENET30)
    assert native.is_available(), "native tier failed to build"
    with tempfile.TemporaryDirectory() as td:
        ingest = bench_ingest(td, arch)
    assembly = bench_assembly(arch)
    print(json.dumps({"ingest": ingest, "assembly": assembly}, indent=2))


if __name__ == "__main__":
    main()
