"""On-device feature extraction pipeline (BASELINE config #2).

The reference extracts fbank per-utterance on host workers
(``otrans/data/audio.py:117-136``). TPU-natively, the loader ships padded
raw waveforms and the whole feature stage — kaldi-compatible log-fbank
(Pallas spectrum kernel), per-utterance CMVN, and SpecAugment — runs as one
jitted function on device, overlapping host I/O with TPU compute and
removing the host feature bottleneck at large batch.

Enable with ``data.extract_on_device: true`` (online dataset only). The
loader then emits ``inputs = {waveforms, wave_lengths}`` and the trainer
prepends :func:`make_device_frontend`'s function to the model step.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .augment import spec_augment_jax
from ..ops.masks import length_to_mask


def make_device_frontend(data_cfg: Any, use_pallas: bool | None = None):
    """Build a jitted (waveforms f32[B, N], lengths i32[B], rng, train) →
    (feats f32[B, T, M], mask bool[B, T]) device function.

    ``use_pallas=None`` auto-selects: the Pallas spectrum kernel on TPU, the
    jnp-FFT path elsewhere (CPU tests / fallback)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    num_mel_bins = int(data_cfg.get("num_mel_bins", 40))
    normalization = bool(data_cfg.get("normalization", False))
    global_mean = global_std = None
    if normalization and data_cfg.get("global_cmvn"):
        base = data_cfg["global_cmvn"]
        global_mean = jnp.asarray(np.load(base + ".mean.npy"))
        global_std = jnp.asarray(np.load(base + ".std.npy"))
    apply_aug = bool(data_cfg.get("spec_augment", False))
    aug_cfg = dict(data_cfg.get("spec_augment_config", {}) or {})
    aug_kwargs = {
        k: aug_cfg[k]
        for k in ("freq_mask_num", "time_mask_num", "freq_mask_rate", "time_mask_rate", "max_mask_time_len")
        if k in aug_cfg
    }

    if use_pallas:
        from ..ops.fbank_pallas import fbank_pallas_batch as fbank_fn
    else:
        from ..ops.fbank import fbank_jax as fbank_fn

    @partial(jax.jit, static_argnames=("train",))
    def frontend(waveforms, lengths, rng, train: bool = True):
        feats, frame_lengths = fbank_fn(waveforms, lengths, num_mel_bins=num_mel_bins)
        t = feats.shape[1]
        mask = length_to_mask(frame_lengths, t)
        if normalization and global_mean is not None:
            feats = (feats - global_mean) / global_std
        elif normalization:
            # per-utterance whole-tensor mean/std over valid frames
            m = mask[..., None].astype(feats.dtype)
            count = jnp.maximum(jnp.sum(m, axis=(1, 2)) * feats.shape[-1], 1.0)
            mean = jnp.sum(feats * m, axis=(1, 2)) / count
            var = jnp.sum(jnp.square(feats - mean[:, None, None]) * m, axis=(1, 2)) / count
            feats = (feats - mean[:, None, None]) / jnp.sqrt(jnp.maximum(var, 1e-10))[:, None, None]
        if apply_aug and train:
            feats = spec_augment_jax(feats, frame_lengths, rng, **aug_kwargs)
        feats = feats * mask[..., None].astype(feats.dtype)
        return feats, mask

    return frontend


def collate_waveforms(samples, sample_multiple: int = 16000):
    """[(utt, wav f32[N], N, targets, U)] → (utt_ids, inputs, targets) with
    waveforms padded to a multiple of ``sample_multiple`` (1 s) for bounded
    compile-shape count."""
    from . import BOS, EOS, PAD

    utt_ids = [s[0] for s in samples]
    wavs = [s[1] for s in samples]
    nlens = [s[2] for s in samples]
    tgts = [s[3] for s in samples]
    ulens = [s[4] for s in samples]
    b = len(samples)
    n_max = max(nlens)
    n_max = ((n_max + sample_multiple - 1) // sample_multiple) * sample_multiple
    u_max = ((max(ulens) + 2 + 7) // 8) * 8

    w = np.zeros((b, n_max), np.float32)
    y = np.full((b, u_max), PAD, np.int32)
    for i in range(b):
        w[i, : nlens[i]] = wavs[i]
        y[i, 0] = BOS
        y[i, 1 : 1 + ulens[i]] = tgts[i]
        y[i, 1 + ulens[i]] = EOS
    inputs = {"waveforms": w, "wave_lengths": np.asarray(nlens, np.int32)}
    targets = {"targets": y, "targets_length": np.asarray(ulens, np.int32) + 1}
    return utt_ids, inputs, targets
