"""Kaldi-compatible log-mel filterbank extraction.

Replaces the reference's dependency on ``torchaudio.compliance.kaldi.fbank``
(C++/libsox; called per-utterance on host at ``otrans/data/audio.py:117-120``
with ``dither=0.0``) with a first-party implementation that exists in two
forms sharing one algorithm:

  * :func:`fbank_numpy` — host-side per-utterance extraction for the data
    pipeline (I/O-bound; matches the reference's host placement).
  * :func:`fbank_jax` — a jittable batched kernel (waveforms padded to
    [B, N]) for on-device extraction fused into the model's forward pass
    (bench config #2: online fbank in the input pipeline). Framing is a
    gather-free strided reshape; the FFT/mel matmul map onto XLA primitives.

Algorithm parity (kaldi `compute-fbank-feats` defaults as mirrored by
torchaudio compliance): snip-edges framing (25ms window / 10ms shift),
DC-offset removal, preemphasis 0.97 (first sample preemphasized against
itself), povey window ((0.5-0.5cos)^0.85), zero-pad to next pow2, power
spectrum, kaldi-style mel banks (mel = 1127·ln(1+f/700), low 20Hz, high
nyquist), log with eps floor. Verified in ``tests/test_fbank.py`` against an
independent naive oracle (literal kaldi formulas, explicit cos/sin DFT) that
runs in this image, plus golden tests vs torchaudio that run where installed.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # torch float32 eps, kaldi's log floor


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=8)
def mel_banks(
    num_bins: int,
    window_padded: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix [num_bins, window_padded//2 + 1].

    The final (nyquist) column is zero, matching kaldi/torchaudio.
    """
    num_fft_bins = window_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_mels = mel_scale(fft_bin_width * np.arange(num_fft_bins))  # [F]
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[None, :] - left) / (center - left)
    down = (right - bin_mels[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return np.concatenate([weights, np.zeros((num_bins, 1), np.float32)], axis=1)


@lru_cache(maxsize=8)
def povey_window(window_size: int) -> np.ndarray:
    n = np.arange(window_size)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_size - 1))
    return (hann ** 0.85).astype(np.float32)


def frame_params(sample_freq: float, frame_length_ms: float, frame_shift_ms: float):
    window_size = int(sample_freq * frame_length_ms / 1000.0)
    window_shift = int(sample_freq * frame_shift_ms / 1000.0)
    padded = 1 << (window_size - 1).bit_length()  # next power of two
    return window_size, window_shift, padded


def num_frames(n_samples: int, sample_freq: float = 16000.0,
               frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0) -> int:
    ws, shift, _ = frame_params(sample_freq, frame_length_ms, frame_shift_ms)
    if n_samples < ws:
        return 0
    return 1 + (n_samples - ws) // shift


def _process_frames_np(frames: np.ndarray, window: np.ndarray, padded: int,
                       mel: np.ndarray, preemph: float, remove_dc: bool) -> np.ndarray:
    if remove_dc:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemph != 0.0:
        prev = np.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemph * prev
    frames = frames * window
    spec = np.fft.rfft(frames, n=padded, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    feats = power @ mel.T
    return np.log(np.maximum(feats, EPSILON))


def fbank_numpy(
    waveform: np.ndarray,
    sample_freq: float = 16000.0,
    num_mel_bins: int = 40,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Host log-fbank: f32[N] (or [1, N]) waveform → f32[T, num_mel_bins]."""
    wav = np.asarray(waveform, np.float32).reshape(-1)
    ws, shift, padded = frame_params(sample_freq, frame_length_ms, frame_shift_ms)
    t = num_frames(len(wav), sample_freq, frame_length_ms, frame_shift_ms)
    if t == 0:
        return np.zeros((0, num_mel_bins), np.float32)
    idx = np.arange(t)[:, None] * shift + np.arange(ws)[None, :]
    frames = wav[idx]
    mel = mel_banks(num_mel_bins, padded, float(sample_freq), float(low_freq), float(high_freq))
    return _process_frames_np(frames, povey_window(ws), padded, mel, preemphasis, remove_dc_offset)


@partial(jax.jit, static_argnames=(
    "sample_freq", "num_mel_bins", "frame_length_ms", "frame_shift_ms",
    "preemphasis", "remove_dc_offset", "low_freq", "high_freq",
))
def fbank_jax(
    waveforms: jnp.ndarray,  # f32[B, N] zero-padded
    sample_lengths: jnp.ndarray,  # i32[B]
    sample_freq: float = 16000.0,
    num_mel_bins: int = 40,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
):
    """Batched on-device log-fbank.

    Returns (feats f32[B, T_max, M], frame_lengths i32[B]) where
    T_max = num_frames(N). Frames whose window crosses a padding boundary are
    garbage and must be masked by the returned lengths (identical numbers to
    per-utterance snip-edges extraction for the valid prefix).
    """
    b, n = waveforms.shape
    ws, shift, padded = frame_params(sample_freq, frame_length_ms, frame_shift_ms)
    t = max(num_frames(n, sample_freq, frame_length_ms, frame_shift_ms), 1)

    starts = jnp.arange(t) * shift
    idx = starts[:, None] + jnp.arange(ws)[None, :]  # [T, ws]
    frames = waveforms[:, idx]  # [B, T, ws]

    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    window = jnp.asarray(povey_window(ws))
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=padded, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.asarray(mel_banks(num_mel_bins, padded, float(sample_freq), float(low_freq), float(high_freq)))
    feats = jnp.einsum("btf,mf->btm", power.astype(jnp.float32), mel,
                       preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(feats, EPSILON))

    frame_lengths = jnp.where(
        sample_lengths >= ws, 1 + (sample_lengths - ws) // shift, 0
    ).astype(jnp.int32)
    return feats, frame_lengths


def logfbank_psf(
    waveform: np.ndarray,
    sample_freq: float = 16000.0,
    num_mel_bins: int = 26,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    nfft: int = 512,
    preemphasis: float = 0.97,
    low_freq: float = 0.0,
    high_freq: float | None = None,
) -> np.ndarray:
    """python_speech_features-style log filterbank.

    The reference's alternate extractor (``otrans/data/audio.py:122``,
    ``psf.base.logfbank``) differs from kaldi: signal-level preemphasis,
    zero-padded ceil framing (not snip-edges), rectangular window, HTK mel
    scale (2595·log10(1+f/700)) with fft-bin-point triangles.
    """
    wav = np.asarray(waveform, np.float64).reshape(-1)
    wav = np.append(wav[0], wav[1:] - preemphasis * wav[:-1])
    ws = int(round(frame_length_ms / 1000.0 * sample_freq))
    shift = int(round(frame_shift_ms / 1000.0 * sample_freq))
    n = len(wav)
    t = 1 if n <= ws else 1 + int(np.ceil((n - ws) / shift))
    padded = np.zeros(int((t - 1) * shift + ws))
    padded[:n] = wav
    idx = np.arange(t)[:, None] * shift + np.arange(ws)[None, :]
    frames = padded[idx]
    power = (np.abs(np.fft.rfft(frames, nfft)) ** 2) / nfft

    high_freq = high_freq or sample_freq / 2
    def htk_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def htk_mel_inv(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mel_pts = np.linspace(htk_mel(low_freq), htk_mel(high_freq), num_mel_bins + 2)
    bin_pts = np.floor((nfft + 1) * htk_mel_inv(mel_pts) / sample_freq).astype(int)
    fb = np.zeros((num_mel_bins, nfft // 2 + 1))
    for j in range(num_mel_bins):
        for i in range(bin_pts[j], bin_pts[j + 1]):
            fb[j, i] = (i - bin_pts[j]) / max(bin_pts[j + 1] - bin_pts[j], 1)
        for i in range(bin_pts[j + 1], bin_pts[j + 2]):
            fb[j, i] = (bin_pts[j + 2] - i) / max(bin_pts[j + 2] - bin_pts[j + 1], 1)
    feat = power @ fb.T
    feat = np.where(feat == 0, np.finfo(float).eps, feat)
    return np.log(feat).astype(np.float32)


def normalize_per_utterance(feature: np.ndarray) -> np.ndarray:
    """Whole-tensor mean/std normalization (reference ``data/audio.py:22-24``)."""
    std = feature.std()
    return (feature - feature.mean()) / max(std, 1e-10)
