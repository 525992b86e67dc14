"""Pallas TPU kernel: fused spectrum+mel stage of kaldi-compatible log-fbank.

The FLOPs of fbank live in the DFT and mel projection. On TPU the
MXU-native formulation of an rfft power spectrum is two real matmuls
against cos/sin bases (no complex arithmetic — power needs only |X|²):

    power = (frames @ C)² + (frames @ S)²      C/S: [ws_pad, n_freq]
    feats = log(max(power @ melᵀ, eps))

This kernel fuses DFT → power → mel → log in VMEM per 128-frame block: the
[T, n_freq] power spectrum never touches HBM (the jnp path materializes it).
Framing/preemphasis/windowing stay in XLA (cheap, fusible, gather-based).

Shapes are lane-aligned: windows pad 400→512 samples (zero rows in the
bases), DFT freqs pad 257→384 columns (zero columns in mel).

``fbank_pallas_batch`` is the drop-in equivalent of ``fbank_jax`` for the
on-device input pipeline; parity is tested against the numpy/torchaudio
path in tests/test_fbank_pallas.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fbank import EPSILON, frame_params, mel_banks, num_frames, povey_window

BLOCK_FRAMES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=4)
def _bases(window_size: int, padded: int, num_mel_bins: int, sample_freq: float):
    """(cos [ws_pad, F], sin [ws_pad, F], mel_t [F, M]) with F lane-aligned."""
    n_freq = padded // 2 + 1
    f_pad = _round_up(n_freq, 128)
    ws_pad = _round_up(window_size, 128)
    n = np.arange(window_size)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * n * f / padded
    cos_b = np.zeros((ws_pad, f_pad), np.float32)
    sin_b = np.zeros((ws_pad, f_pad), np.float32)
    cos_b[:window_size, :n_freq] = np.cos(ang)
    sin_b[:window_size, :n_freq] = np.sin(ang)
    mel = mel_banks(num_mel_bins, padded, float(sample_freq))  # [M, n_freq]
    mel_t = np.zeros((f_pad, num_mel_bins), np.float32)
    mel_t[:n_freq, :] = mel.T
    return cos_b, sin_b, mel_t


def _spec_mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    frames = frames_ref[:]  # [BLOCK, ws_pad]
    # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which costs
    # ~0.5 absolute error in log-mel space — unacceptable for feature parity
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32, precision=hp)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32, precision=hp)
    power = re * re + im * im
    feats = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hp)
    out_ref[:] = jnp.log(jnp.maximum(feats, EPSILON))


def _extract_frames(wave: jnp.ndarray, t_pad: int, ws: int, ws_pad: int, shift: int):
    """[N] → windowed f32[t_pad, ws_pad] frames (DC removal, preemph, povey).

    Framing is gather-free: with ws = k·shift + rem, frame t is the
    concatenation of rows t..t+k of wave reshaped to [_, shift] (plus a rem
    slice) — pure reshape/slice/concat, which XLA lowers to cheap copies
    (a [T, ws] gather is pathologically slow on TPU).
    """
    k_full, rem = divmod(ws, shift)
    rows_needed = t_pad + k_full + (1 if rem else 0)
    need = rows_needed * shift
    wave = jnp.pad(wave, (0, max(need - wave.shape[0], 0)))
    r = wave[: rows_needed * shift].reshape(rows_needed, shift)
    parts = [r[i : i + t_pad] for i in range(k_full)]
    if rem:
        parts.append(r[k_full : k_full + t_pad, :rem])
    frames = jnp.concatenate(parts, axis=1)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(povey_window(ws))
    return jnp.pad(frames, ((0, 0), (0, ws_pad - ws)))


@partial(jax.jit, static_argnames=("num_mel_bins", "sample_freq"))
def fbank_pallas(
    waveform: jnp.ndarray,  # f32[N]
    num_mel_bins: int = 40,
    sample_freq: float = 16000.0,
):
    """Fused log-fbank for one waveform → f32[T_pad, M]; slice [:num_frames(N)]."""
    ws, shift, padded = frame_params(sample_freq, 25.0, 10.0)
    ws_pad = _round_up(ws, 128)
    t = num_frames(waveform.shape[0], sample_freq)
    t_pad = max(_round_up(t, BLOCK_FRAMES), BLOCK_FRAMES)
    frames = _extract_frames(waveform, t_pad, ws, ws_pad, shift)
    cos_b, sin_b, mel_t = _bases(ws, padded, num_mel_bins, float(sample_freq))
    m_pad = _round_up(num_mel_bins, 128)
    mel_t = np.pad(mel_t, ((0, 0), (0, m_pad - num_mel_bins)))

    out = pl.pallas_call(
        _spec_mel_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
        grid=(t_pad // BLOCK_FRAMES,),
        in_specs=[
            pl.BlockSpec((BLOCK_FRAMES, ws_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_FRAMES, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(frames, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_t))
    return out[:, :num_mel_bins]


@partial(jax.jit, static_argnames=("num_mel_bins", "sample_freq"))
def fbank_pallas_batch(
    waveforms: jnp.ndarray,  # f32[B, N]
    sample_lengths: jnp.ndarray,  # i32[B]
    num_mel_bins: int = 40,
    sample_freq: float = 16000.0,
):
    """Batched drop-in for ``fbank_jax`` using the pallas spectrum kernel.

    Returns (feats f32[B, T_max, M], frame_lengths i32[B]).
    """
    ws, shift, _ = frame_params(sample_freq, 25.0, 10.0)
    n = waveforms.shape[1]
    t = max(num_frames(n, sample_freq), 1)
    feats = jax.vmap(lambda w: fbank_pallas(w, num_mel_bins, sample_freq))(waveforms)
    frame_lengths = jnp.where(
        sample_lengths >= ws, 1 + (sample_lengths - ws) // shift, 0
    ).astype(jnp.int32)
    return feats[:, :t], frame_lengths
