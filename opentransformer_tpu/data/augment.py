"""SpecAugment.

Host variant matches the reference exactly (``otrans/data/augment.py:9-41``):
``freq_mask_num``×freq masks of width U(0, num_mels·freq_mask_rate) and
``time_mask_num``×time masks of width U(0, min(T·time_mask_rate,
max_mask_time_len)), zero-filled, applied per-utterance pre-padding (so only
real frames are ever masked). No time-warp, like the reference.

``spec_augment_jax`` is a batched on-device variant for the fused input
pipeline: identical mask distribution, vectorized over the batch, padding
frames excluded via per-utterance lengths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def spec_augment(
    mel_spectrogram: np.ndarray,
    freq_mask_num: int = 2,
    time_mask_num: int = 2,
    freq_mask_rate: float = 0.3,
    time_mask_rate: float = 0.05,
    max_mask_time_len: int = 100,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """In-place-free host SpecAugment on one [T, F] utterance."""
    rng = rng or np.random.default_rng()
    out = np.array(mel_spectrogram, copy=True)
    tau, v = out.shape
    freq_para = int(v * freq_mask_rate)
    time_para = min(int(tau * time_mask_rate), max_mask_time_len)

    for _ in range(freq_mask_num):
        f = int(rng.uniform(0.0, freq_para))
        f0 = int(rng.integers(0, v - f + 1))
        out[:, f0 : f0 + f] = 0.0
    for _ in range(time_mask_num):
        t = int(rng.uniform(0.0, time_para))
        t0 = int(rng.integers(0, tau - t + 1))
        out[t0 : t0 + t, :] = 0.0
    return out


@partial(
    jax.jit,
    static_argnames=("freq_mask_num", "time_mask_num", "freq_mask_rate",
                     "time_mask_rate", "max_mask_time_len"),
)
def spec_augment_jax(
    feats: jnp.ndarray,  # f[B, T, F] padded
    lengths: jnp.ndarray,  # i32[B] real frame counts
    rng_key: jax.Array,
    freq_mask_num: int = 2,
    time_mask_num: int = 2,
    freq_mask_rate: float = 0.3,
    time_mask_rate: float = 0.05,
    max_mask_time_len: int = 100,
) -> jnp.ndarray:
    """Batched on-device SpecAugment (mask widths drawn per utterance)."""
    b, t, v = feats.shape
    freq_para = int(v * freq_mask_rate)
    keys = jax.random.split(rng_key, 2 * (freq_mask_num + time_mask_num))
    ki = iter(keys)

    mask = jnp.ones((b, t, v), feats.dtype)
    fbins = jnp.arange(v)[None, :]
    tbins = jnp.arange(t)[None, :]

    for _ in range(freq_mask_num):
        f = jnp.floor(jax.random.uniform(next(ki), (b, 1)) * freq_para)
        f0 = jnp.floor(jax.random.uniform(next(ki), (b, 1)) * (v - f + 1))
        keep = ~((fbins >= f0) & (fbins < f0 + f))  # [B, F]
        mask = mask * keep[:, None, :].astype(feats.dtype)

    time_para = jnp.minimum(
        jnp.floor(lengths.astype(jnp.float32) * time_mask_rate), float(max_mask_time_len)
    )[:, None]
    for _ in range(time_mask_num):
        tm = jnp.floor(jax.random.uniform(next(ki), (b, 1)) * time_para)
        t0 = jnp.floor(jax.random.uniform(next(ki), (b, 1)) * (lengths[:, None] - tm + 1))
        keep = ~((tbins >= t0) & (tbins < t0 + tm))  # [B, T]
        mask = mask * keep[:, :, None].astype(feats.dtype)

    return feats * mask
