"""Log-mel spectrogram frontend (pure numpy/jnp; no librosa in this image).

Reference parity: the reference's local-conditioning features are mel-style
frame-rate features extracted from the waveform (SURVEY.md §2.1
"Local-conditioning frontend"). Standard Slaney-free HTK mel filterbank +
magnitude STFT + log compression; frames are centered (reflect padding) so
frame i corresponds to sample i * hop.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float = 0.0, fmax: float = None
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_fft // 2 + 1, n_mels)."""
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def log_mel_spectrogram(
    wav: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = 1024,
    hop: int = 256,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """Waveform (B, T) -> log-mel frames (B, ceil(T / hop), n_mels)."""
    if wav.ndim == 1:
        wav = wav[None]
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = -(-wav.shape[1] // hop)
    # Frame into (B, n_frames, n_fft) windows.
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = x[:, idx]  # gather; fine at feature-extraction rates
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("btf,fm->btm", spec, fb)
    return jnp.log(jnp.maximum(mel, 1e-5))
