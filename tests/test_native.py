"""Native (C++) IO tier: bit-exact parity vs the Python loader oracle.

The native tier (lb_wavenet_tpu/native) re-implements the byte work of
SURVEY.md §2.1's dataset component; these tests pin it EXACTLY to the
Python/jnp semantics (ops/geometry.py, ops/mulaw.py, data.py) on
randomized geometry including every boundary case.
"""
import io
import struct

import numpy as np
import pytest

from lb_wavenet_tpu import data, native
from lb_wavenet_tpu.config import ArchConfig, TrainConfig
from lb_wavenet_tpu.ops import geometry

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native loader unavailable (no g++?)"
)


def _wav_bytes(pcm: np.ndarray, sr: int, extra_chunk: bool = False) -> bytes:
    """Minimal RIFF/PCM16 mono writer (independent of scipy)."""
    assert pcm.dtype == np.int16
    payload = pcm.tobytes()
    buf = io.BytesIO()
    chunks = b""
    chunks += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    if extra_chunk:  # parsers must skip unknown chunks (e.g. LIST)
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    buf.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    return buf.getvalue()


def test_lut_encode_matches_jnp_everywhere():
    """All 65536 PCM16 values: LUT class == jnp mu_law_encode class."""
    import jax.numpy as jnp

    from lb_wavenet_tpu.ops.mulaw import mu_law_encode

    lut = native.mulaw_lut(256)
    grid = jnp.arange(-32768, 32768, dtype=jnp.float32) / 32768.0
    ref = np.asarray(mu_law_encode(grid, 256))
    np.testing.assert_array_equal(lut, ref)
    assert lut.min() >= 0 and lut.max() <= 255


@pytest.mark.parametrize("extra_chunk", [False, True])
def test_ingest_wav_matches_python(extra_chunk):
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, 16000, dtype=np.int16)
    pcm[:4] = [-32768, 32767, 0, -1]  # exact boundary samples
    raw = _wav_bytes(pcm, 16000, extra_chunk)

    wav, enc, sr = native.ingest_wav(raw, 256)
    assert sr == 16000

    # Python oracle: scipy load + jnp encode.
    import jax.numpy as jnp
    import scipy.io.wavfile as wavfile

    from lb_wavenet_tpu.ops.mulaw import mu_law_encode

    sr_ref, pcm_ref = wavfile.read(io.BytesIO(raw))
    wav_ref = pcm_ref.astype(np.float32) / 32768.0
    enc_ref = np.asarray(mu_law_encode(jnp.asarray(wav_ref), 256))
    np.testing.assert_array_equal(wav, wav_ref)
    np.testing.assert_array_equal(enc, enc_ref)


def test_ingest_rejects_malformed_and_falls_back_cleanly():
    with pytest.raises(ValueError):
        native.ingest_wav(b"RIFFxxxxWAVEjunk", 256)
    # Stereo -> None (Python fallback), not an exception.
    pcm = np.zeros(64, dtype=np.int16)
    raw = bytearray(_wav_bytes(pcm, 16000))
    raw[22] = 2  # channels field
    assert native.ingest_wav(bytes(raw), 256) is None


def test_extensible_non_pcm_falls_back():
    """WAVE_FORMAT_EXTENSIBLE whose SubFormat GUID is NOT PCM must go to
    the Python fallback, not be silently decoded as linear PCM."""
    pcm = np.zeros(32, dtype=np.int16)
    payload = pcm.tobytes()
    # 40-byte extensible fmt: format 0xFFFE, GUID format code 3 (IEEE float)
    guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(12)
    body = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    body += struct.pack("<HH", 22, 16) + struct.pack("<I", 0) + guid
    chunks = b"fmt " + struct.pack("<I", len(body)) + body
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert native.ingest_wav(raw, 256) is None

    # ... while an extensible container whose GUID IS PCM ingests fine.
    guid_pcm = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    body2 = body[:-16] + guid_pcm
    chunks = b"fmt " + struct.pack("<I", len(body2)) + body2
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    out = native.ingest_wav(raw, 256)
    assert out is not None and len(out[0]) == 32


def test_assemble_out_of_range_pair_raises():
    """A bad (fi, wi) pair raises IndexError instead of corrupting memory."""
    enc = np.arange(10, dtype=np.int32)
    offsets = np.array([0, 10], dtype=np.int64)
    with pytest.raises(IndexError, match="out of range"):
        native.assemble_windows(enc, offsets, [(0, 5)], 4, 3)  # wi max is 2
    with pytest.raises(IndexError, match="out of range"):
        native.assemble_windows(enc, offsets, [(1, 0)], 4, 3)  # fi max is 0
    with pytest.raises(IndexError, match="out of range"):
        native.assemble_windows(enc, offsets, [(0, 0), (0, -1)], 4, 3)


def test_kill_switch_never_builds(monkeypatch):
    """WAVENET_NATIVE_LOADER=0 must not trigger a g++ compile."""
    monkeypatch.setenv("WAVENET_NATIVE_LOADER", "0")

    def boom():  # _lib() being reached means a build could start
        raise AssertionError("_lib() called despite the kill switch")

    monkeypatch.setattr(native, "_lib", boom)
    assert native.ingest_wav(b"\x00" * 16, 256) is None
    assert (
        native.assemble_windows(
            np.zeros(4, np.int32), np.array([0, 4], np.int64), [(0, 0)], 2, 1
        )
        is None
    )
    assert native.is_available() is False


def test_from_dir_ingest_error_names_file(tmp_path):
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8,
    )
    pcm = np.zeros(500, dtype=np.int16)
    (tmp_path / "ok.wav").write_bytes(_wav_bytes(pcm, arch.sample_rate))
    # Truncated container: data chunk promises more bytes than exist.
    good = _wav_bytes(pcm, arch.sample_rate)
    (tmp_path / "bad.wav").write_bytes(good[: len(good) // 2])
    with pytest.raises(ValueError, match="bad.wav"):
        data.Corpus.from_dir(str(tmp_path), arch, window_size=64)


def test_assemble_matches_extract_window_randomized():
    """Randomized files/windows incl. edge windows, short files, big R."""
    rng = np.random.default_rng(1)
    for trial in range(20):
        w = int(rng.integers(1, 40))
        r = int(rng.integers(1, 70))
        files = [
            rng.integers(0, 256, int(rng.integers(2, 150)), dtype=np.int32)
            for _ in range(int(rng.integers(1, 6)))
        ]
        offsets = np.zeros(len(files) + 1, dtype=np.int64)
        np.cumsum([len(f) for f in files], out=offsets[1:])
        concat = np.ascontiguousarray(np.concatenate(files).astype(np.int32))
        pairs = [
            (fi, wi)
            for fi, f in enumerate(files)
            for wi in range(geometry.num_windows(len(f), w))
        ]
        out = native.assemble_windows(concat, offsets, pairs, w, r)
        assert out is not None
        inputs, targets, mask = out
        for row, (fi, wi) in enumerate(pairs):
            i_ref, t_ref, m_ref = geometry.extract_window(files[fi], w, r, wi)
            np.testing.assert_array_equal(inputs[row], i_ref, err_msg=f"{trial=} {fi=} {wi=}")
            np.testing.assert_array_equal(targets[row], t_ref)
            np.testing.assert_array_equal(mask[row], m_ref)


def test_make_batches_native_equals_python(monkeypatch):
    """End-to-end: the batch stream is bit-identical with the tier on/off."""
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8,
    )
    corpus = data.synthetic_corpus(arch, window_size=50, n_files=3,
                                   file_len=700)
    train = TrainConfig(batch_size=4, window_size=50, seed=3)

    def take(n):
        it = data.make_batches(corpus, train)
        return [next(it) for _ in range(n)]

    native_batches = take(6)
    monkeypatch.setenv("WAVENET_NATIVE_LOADER", "0")
    assert not native.is_available()
    python_batches = take(6)
    for nb, pb in zip(native_batches, python_batches):
        np.testing.assert_array_equal(nb.inputs, pb.inputs)
        np.testing.assert_array_equal(nb.targets, pb.targets)
        np.testing.assert_array_equal(nb.mask, pb.mask)


def test_from_dir_native_equals_python(tmp_path, monkeypatch):
    arch = ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8,
    )
    rng = np.random.default_rng(2)
    for i in range(3):
        pcm = rng.integers(-32768, 32768, 2000 + 37 * i, dtype=np.int16)
        (tmp_path / f"f{i}.wav").write_bytes(_wav_bytes(pcm, arch.sample_rate))
    c_native = data.Corpus.from_dir(str(tmp_path), arch, window_size=64)
    monkeypatch.setenv("WAVENET_NATIVE_LOADER", "0")
    c_python = data.Corpus.from_dir(str(tmp_path), arch, window_size=64)
    assert len(c_native.encoded) == len(c_python.encoded)
    for en, ep, wn, wp in zip(
        c_native.encoded, c_python.encoded, c_native.waves, c_python.waves
    ):
        np.testing.assert_array_equal(en, ep)
        np.testing.assert_array_equal(wn, wp)
