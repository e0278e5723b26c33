"""Speaker-labeled corpora: per-speaker directory layout → global cond.

Reference parity: the reference's global conditioning is a speaker-id
embedding broadcast over time (SURVEY.md §2.1 "Global conditioning");
this covers the data-layer path that makes it reachable from the CLI —
`Corpus.from_dir` on a `data_dir/<speaker>/*.wav` layout — plus a
speaker-conditioned train step end to end.
"""
import numpy as np
import pytest

from lb_wavenet_tpu import data
from lb_wavenet_tpu.config import ArchConfig, TrainConfig


def _arch(n_speakers=0):
    return ArchConfig(
        n_blocks=2, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_speakers=n_speakers,
        compute_dtype="float32",
    )


def _write_corpus(root, arch, layout):
    """layout: {relpath_dir: n_files}; returns total files written."""
    rng = np.random.default_rng(0)
    total = 0
    for d, n in layout.items():
        sub = root / d if d else root
        sub.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            wav = rng.uniform(-0.5, 0.5, 600).astype(np.float32)
            data.write_wav(str(sub / f"u{i}.wav"), wav, arch.sample_rate)
            total += 1
    return total


def test_speaker_layout_labels(tmp_path):
    arch = _arch(n_speakers=4)
    _write_corpus(tmp_path, arch, {"spk_b": 2, "spk_a": 3, "empty_dir": 0})
    c = data.Corpus.from_dir(str(tmp_path), arch, window_size=64)
    # sorted subdir names -> ids; empty dirs ignored
    assert c.speaker_names == ["spk_a", "spk_b"]
    assert c.speakers == [0, 0, 0, 1, 1]
    assert len(c.waves) == 5

    # labels flow into batches aligned with the window's file
    train = TrainConfig(batch_size=4, window_size=64, seed=1)
    b = next(data.make_batches(c, train))
    assert b.speaker is not None and b.speaker.shape == (4,)
    assert set(b.speaker.tolist()) <= {0, 1}


def test_flat_layout_has_no_labels(tmp_path):
    arch = _arch()
    _write_corpus(tmp_path, arch, {"": 3})
    c = data.Corpus.from_dir(str(tmp_path), arch, window_size=64)
    assert c.speakers is None and c.speaker_names is None


def test_mixed_layout_rejected(tmp_path):
    arch = _arch(n_speakers=2)
    _write_corpus(tmp_path, arch, {"": 1, "spk_a": 1})
    with pytest.raises(ValueError, match="ambiguous layout"):
        data.Corpus.from_dir(str(tmp_path), arch, window_size=64)


def test_too_many_speakers_rejected(tmp_path):
    arch = _arch(n_speakers=1)
    _write_corpus(tmp_path, arch, {"spk_a": 1, "spk_b": 1})
    with pytest.raises(ValueError, match="n_speakers"):
        data.Corpus.from_dir(str(tmp_path), arch, window_size=64)


def test_unconditioned_arch_drops_labels_with_warning(tmp_path):
    arch = _arch(n_speakers=0)
    _write_corpus(tmp_path, arch, {"spk_a": 1, "spk_b": 1})
    with pytest.warns(UserWarning, match="unconditioned"):
        c = data.Corpus.from_dir(str(tmp_path), arch, window_size=64)
    assert c.speakers is None
    assert len(c.waves) == 2


def test_speaker_conditioned_training_end_to_end(tmp_path):
    """run_training on a speaker layout: loss finite + decreasing, and the
    speaker embedding actually receives gradient."""
    import jax

    from lb_wavenet_tpu import Config
    from lb_wavenet_tpu.train import run_training

    arch = _arch(n_speakers=2)
    _write_corpus(tmp_path / "wavs", arch, {"spk_a": 2, "spk_b": 2})
    from lb_wavenet_tpu.models.wavenet import init_params

    cfg = Config(
        arch=arch,
        train=TrainConfig(
            batch_size=8, window_size=32, n_steps=8, log_every=100,
            checkpoint_every=0, learning_rate=1e-3,
            checkpoint_dir=str(tmp_path / "ckpt"),
            data_dir=str(tmp_path / "wavs"),
        ),
    )
    corpus = data.Corpus.from_dir(str(tmp_path / "wavs"), arch, 32)
    state = run_training(cfg, corpus=corpus)
    final_embed = np.asarray(state.params["speaker_embed"])
    # run_training seeds init_params with key(train.seed) (train.py).
    fresh = np.asarray(
        init_params(jax.random.key(cfg.train.seed), arch)["speaker_embed"]
    )
    assert np.isfinite(final_embed).all()
    # Adam moved the embedding away from its init.
    assert not np.allclose(final_embed, fresh)
