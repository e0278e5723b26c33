"""Integration tier: mel-conditioned vocoder path end-to-end (BASELINE
config 3 shrunk to CI size): mel extraction -> windowed loader with mel
frames -> conditioned training -> conditioned generation."""
import jax
import jax.numpy as jnp
import numpy as np

from lb_wavenet_tpu.config import ArchConfig, Config, TrainConfig
from lb_wavenet_tpu.data import make_batches, synthetic_corpus
from lb_wavenet_tpu.generate import generate
from lb_wavenet_tpu.ops.mel import log_mel_spectrogram
from lb_wavenet_tpu.train import run_training

MEL_ARCH = ArchConfig(
    n_blocks=1,
    n_layers_per_block=3,
    residual_channels=8,
    skip_channels=8,
    gate_channels=8,
    n_mels=8,
    cond_channels=8,
    upsample_factors=(4, 4),  # hop 16
    compute_dtype="float32",
)


def test_mel_shapes():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1000)), jnp.float32)
    mel = log_mel_spectrogram(wav, n_mels=8, n_fft=64, hop=16)
    assert mel.shape == (2, 63, 8)  # ceil(1000/16)
    assert bool(jnp.all(jnp.isfinite(mel)))


def test_loader_emits_aligned_mel():
    corpus = synthetic_corpus(MEL_ARCH, 64, n_files=2, file_len=1500)
    train = TrainConfig(batch_size=2, window_size=64, seed=0)
    batch = next(make_batches(corpus, train, with_mel=True))
    in_len = MEL_ARCH.receptive_field - 1 + 64
    n_frames = -(-in_len // MEL_ARCH.hop_size)
    assert batch.mel.shape == (2, n_frames, 8)
    assert np.isfinite(batch.mel).all()


def test_mel_train_and_generate(tmp_path):
    cfg = Config(
        arch=MEL_ARCH,
        train=TrainConfig(
            batch_size=2,
            mesh_data=2,
            window_size=64,
            learning_rate=1e-3,
            n_steps=6,
            log_every=3,
            checkpoint_every=6,
            checkpoint_dir=str(tmp_path / "ck"),
            seed=0,
        ),
    )
    corpus = synthetic_corpus(MEL_ARCH, 64, n_files=2, file_len=1500)
    state = run_training(cfg, corpus=corpus)
    assert int(state.step) == 6

    # Vocode from mel frames of a held-out waveform.
    wav = corpus.waves[0][:320]
    frames = log_mel_spectrogram(
        jnp.asarray(wav[None]), n_mels=8, hop=16, sample_rate=16000
    )
    out = generate(
        state.params,
        MEL_ARCH,
        jax.random.key(0),
        batch=1,
        n_samples=320,
        cond_frames=frames,
    )
    assert out.shape == (1, 320)
    assert bool(jnp.all(jnp.isfinite(out)))
