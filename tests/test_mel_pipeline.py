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


def test_streaming_upsampler_bit_matches_one_shot():
    """StreamingUpsampler(feed*, finish) == one upsample_cond call, for
    even, uneven, and single-frame chunkings (incl. chunks smaller than the
    lookahead, which emit nothing until it builds)."""
    from lb_wavenet_tpu.models.conditioning import (
        StreamingUpsampler,
        cond_halo_frames,
        upsample_cond,
    )
    from lb_wavenet_tpu.models.wavenet import init_params

    params = init_params(jax.random.key(0), MEL_ARCH)
    frames = jax.random.normal(jax.random.key(1), (2, 17, MEL_ARCH.n_mels))
    full = np.asarray(
        upsample_cond(params["upsampler"], MEL_ARCH, frames, jnp.float32)
    )
    assert cond_halo_frames(MEL_ARCH) == 2  # 1 + 1/4 + ... -> ceil 2

    for sizes in [[17], [4, 4, 4, 5], [1] * 17, [2, 10, 5], [16, 1]]:
        ups = StreamingUpsampler(params["upsampler"], MEL_ARCH)
        parts, a = [], 0
        for s in sizes:
            parts.append(np.asarray(ups.feed(frames[:, a : a + s])))
            a += s
        parts.append(np.asarray(ups.finish()))
        got = np.concatenate(parts, axis=1)
        np.testing.assert_array_equal(got, full, err_msg=str(sizes))


def test_streaming_mel_synthesis_bit_matches_one_shot():
    """Full streaming vocoder path: mel frames fed incrementally through
    StreamingUpsampler, cond chunks driving stream_chunk — output equals the
    one-shot conditioned generation, for the scan, turbo AND mega engines."""
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )
    from lb_wavenet_tpu.models.conditioning import (
        StreamingUpsampler,
        upsample_cond,
    )
    from lb_wavenet_tpu.models.wavenet import init_params

    params = init_params(jax.random.key(0), MEL_ARCH)
    hop = MEL_ARCH.hop_size
    n_frames, b = 12, 2
    frames = jax.random.normal(jax.random.key(1), (b, n_frames, MEL_ARCH.n_mels))
    n_samples = n_frames * hop  # 192
    cond_full = upsample_cond(
        params["upsampler"], MEL_ARCH, frames, jnp.float32
    )

    for engine in ["xla", "turbo", "mega"]:
        ref = np.asarray(
            generate_classes(
                params, MEL_ARCH, jax.random.key(7), b, n_samples,
                cond=cond_full, engine=engine,
            )
        )
        chunk = 4 * hop  # 64 samples = 4 frames per chunk
        ups = StreamingUpsampler(params["upsampler"], MEL_ARCH)
        stream = start_stream(
            MEL_ARCH, b, jax.random.key(7), engine=engine, params=params
        )
        pending = np.zeros((b, 0, MEL_ARCH.cond_channels), np.float32)
        got = []
        fed = 0
        while sum(g.shape[1] for g in got) < n_samples:
            while pending.shape[1] < chunk:
                if fed < n_frames:
                    out = ups.feed(frames[:, fed : fed + 4])
                    fed += 4
                else:
                    out = ups.finish()
                pending = np.concatenate(
                    [pending, np.asarray(out)], axis=1
                )
            classes, stream = stream_chunk(
                params, MEL_ARCH, stream, chunk,
                cond=jnp.asarray(pending[:, :chunk]), engine=engine,
            )
            pending = pending[:, chunk:]
            got.append(np.asarray(classes))
        np.testing.assert_array_equal(
            np.concatenate(got, axis=1), ref, err_msg=engine
        )


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
