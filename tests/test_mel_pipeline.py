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


# ---------------------------------------------------------------------------
# Numerical validation of the frontend against external references
# (VERDICT r1 item 5): scipy.signal STFT and the published HTK filterbank
# formulas, not just internal consistency.


def test_stft_matches_scipy():
    """Our framed |rfft| == scipy.signal.stft on the same reflect-padded
    signal (identical symmetric Hann window, centering, and hop)."""
    import scipy.signal

    n_fft, hop, sr = 256, 64, 16000
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(1000).astype(np.float32)

    from lb_wavenet_tpu.ops.mel import log_mel_spectrogram, mel_filterbank

    # Reproduce the module's spectrogram up to the mel projection by
    # inverting the log + filterbank-free path: recompute spec directly.
    pad = n_fft // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    win = np.hanning(n_fft).astype(np.float32)
    n_frames = -(-len(wav) // hop)
    ours = np.stack([
        np.abs(np.fft.rfft(x[i * hop : i * hop + n_fft] * win))
        for i in range(n_frames)
    ])
    # scipy on the SAME padded input, no extra boundary handling.
    f, t, Z = scipy.signal.stft(
        x, fs=sr, window=win, nperseg=n_fft, noverlap=n_fft - hop,
        boundary=None, padded=False, detrend=False, return_onesided=True,
    )
    theirs = (np.abs(Z) * win.sum()).T[:n_frames]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    # And the module's full output == log(max(spec @ fb, eps)) with the
    # verified spec (ties log_mel_spectrogram to the scipy-validated STFT).
    fb = mel_filterbank(8, n_fft, sr)
    expect = np.log(np.maximum(ours @ fb, 1e-5))
    got = np.asarray(log_mel_spectrogram(
        jnp.asarray(wav), n_mels=8, n_fft=n_fft, hop=hop, sample_rate=sr
    ))[0]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_htk_mel_scale_closed_form():
    """hz<->mel is the published HTK formula: m = 2595 log10(1 + f/700)."""
    from lb_wavenet_tpu.ops.mel import hz_to_mel, mel_to_hz

    # Closed-form anchor points.
    np.testing.assert_allclose(hz_to_mel(0.0), 0.0)
    np.testing.assert_allclose(hz_to_mel(700.0), 2595.0 * np.log10(2.0))
    np.testing.assert_allclose(hz_to_mel(1000.0), 999.9855371, rtol=1e-7)
    for f in (10.0, 440.0, 7999.0):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6)


def test_mel_filterbank_matches_hand_htk_triangles():
    """Filterbank weights == an independent evaluation of the HTK triangle
    definition H_m(k) = max(0, min((f_k-lo)/(c-lo), (hi-f_k)/(hi-c)))."""
    from lb_wavenet_tpu.ops.mel import mel_filterbank

    n_mels, n_fft, sr = 10, 512, 16000
    fb = mel_filterbank(n_mels, n_fft, sr)
    assert fb.shape == (n_fft // 2 + 1, n_mels)

    # Independent recomputation from the published definition.
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    edges = imel(np.linspace(mel(0.0), mel(sr / 2.0), n_mels + 2))
    freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    ref = np.zeros_like(fb)
    for m in range(n_mels):
        lo, c, hi = edges[m], edges[m + 1], edges[m + 2]
        for k, f in enumerate(freqs):
            if lo <= f <= c:
                ref[k, m] = (f - lo) / (c - lo)
            elif c < f <= hi:
                ref[k, m] = (hi - f) / (hi - c)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-6)

    # Structural HTK properties: unit peak, contiguous triangle support.
    assert np.all(fb.max(axis=0) > 0.95)
    assert np.all(fb >= 0.0) and np.all(fb <= 1.0 + 1e-6)
