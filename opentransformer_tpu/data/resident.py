"""Device-resident corpus training input pipeline.

The reference streams every batch host→device each step
(``otrans/train/trainer.py:147`` iterating a torch DataLoader). On a TPU
that wastes the interconnect: at flagship geometry a 24-step scan window
ships ~283 MB of padded f32 features per dispatch, and on a tunneled or
PCIe-attached host that transfer — not the math — dominates step time
(measured 3-10x the compute on the v5e tunnel).

TPU-natively the whole precomputed-feature corpus fits in HBM (20k
utterances x 1152 frames x 40 mel = 1.8 GB f16), so we upload it ONCE and
make the per-step input a ``[B] int32`` gather index:

  * the loader yields ``corpus_idx`` + target matrices (tiny);
  * inside the jitted train step :func:`make_resident_preprocess`'s
    function gathers feature rows, casts f16→f32, adds fresh masked
    gaussian noise (``additive_noise_std``) with the device PRNG, and
    applies batched on-device SpecAugment (:func:`spec_augment_jax`);
  * augmentation runs on the MXU/VPU for free relative to the H2D it
    replaces, and fresh per-epoch noise needs no host RNG.

Every batch gathers to the corpus-max frame shape, so all buckets share
ONE compile signature (padding compute is the tradeoff — ideal when bucket
boundaries are few or uniform). Enable with ``data.device_resident: true``
(precomputed-feature datasets: kaldi / espnet; train split only —
evaluation keeps the host path).
"""

from __future__ import annotations

import logging
import time
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)

_STORAGE_DTYPES = {"float16": np.float16, "float32": np.float32,
                   "bfloat16": "bfloat16"}


def build_corpus(dataset, pad_to_frames: int | None = None,
                 pad_multiple: int = 1, storage_dtype: str = "float16"):
    """Read every utterance's CLEAN features (augmentation OFF) into one
    padded ``[N, T_max, D]`` array + ``[N] int32`` frame lengths.

    ``dataset`` must expose ``file_list``/``targets_dict`` semantics via
    plain ``__getitem__`` (kaldi/espnet datasets); augmentation must already
    be disabled on it (the loader builds a clean twin — noise/SpecAugment
    move on-device so they stay fresh per epoch instead of getting baked
    into the resident copy).
    """
    if storage_dtype not in _STORAGE_DTYPES:
        raise ValueError(f"device_resident_dtype {storage_dtype!r} not in "
                         f"{sorted(_STORAGE_DTYPES)}")
    import jax.numpy as jnp  # bfloat16 storage needs the ml_dtypes alias
    np_dtype = jnp.bfloat16 if storage_dtype == "bfloat16" else _STORAGE_DTYPES[storage_dtype]

    n = len(dataset)
    if n == 0:
        raise ValueError("device_resident: empty dataset")
    first = dataset[0]
    dim = first[1].shape[1]
    lens = np.zeros((n,), np.int32)
    # two-pass build: scan lengths first, then fill the preallocated padded
    # array one utterance at a time — holding every unpadded f32 feature
    # AND the padded corpus simultaneously costs ~5.5 GB transient host RAM
    # at flagship geometry, which small build hosts don't have
    t_max = 0
    for i in range(n):
        f = (first if i == 0 else dataset[i])[1]
        lens[i] = f.shape[0]
        t_max = max(t_max, f.shape[0])
    if pad_to_frames and t_max <= int(pad_to_frames):
        # matches the host path's bucket-boundary pad shape exactly
        t_max = int(pad_to_frames)
    elif pad_multiple > 1:
        # over-long corpus: quantize like the sampler's pseudo-boundaries
        t_max = ((t_max + pad_multiple - 1) // pad_multiple) * pad_multiple
    corpus = np.zeros((n, t_max, dim), np_dtype)
    for i in range(n):
        f = (first if i == 0 else dataset[i])[1]
        corpus[i, : f.shape[0]] = f.astype(np_dtype)
    return corpus, lens


def make_resident_preprocess(data_cfg: Any, corpus, lens, mesh=None):
    """Upload the corpus and build the jit-inlineable
    ``(corpus_idx, targets, targets_length, *, rng, train) →
    (feats, mask, targets, targets_length)`` preprocess function.

    Under a mesh the corpus is replicated (every data shard gathers its own
    rows); the gather output inherits ``corpus_idx``'s batch sharding via
    GSPMD. Returns ``(preprocess_fn, (feats_dev, lens_dev))``.
    """
    import jax
    import jax.numpy as jnp

    from .augment import spec_augment_jax
    from ..ops.masks import length_to_mask

    noise_std = float(data_cfg.get("additive_noise_std", 0.0))
    apply_aug = bool(data_cfg.get("spec_augment", False))
    aug_cfg = dict(data_cfg.get("spec_augment_config", {}) or {})
    aug_kwargs = {
        k: aug_cfg[k]
        for k in ("freq_mask_num", "time_mask_num", "freq_mask_rate",
                  "time_mask_rate", "max_mask_time_len")
        if k in aug_cfg
    }

    t0 = time.time()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        feats_dev = jax.device_put(corpus, rep)
        lens_dev = jax.device_put(lens, rep)
    else:
        feats_dev = jax.device_put(corpus)
        lens_dev = jax.device_put(lens)
    jax.block_until_ready((feats_dev, lens_dev))
    gb = corpus.nbytes / 1e9
    dt = time.time() - t0
    logger.info(
        "device-resident corpus: %d utts [%d, %d, %d] %s = %.2f GB uploaded "
        "in %.1f s (%.0f MB/s) — per-step feature H2D eliminated",
        corpus.shape[0], *corpus.shape, corpus.dtype, gb, dt,
        gb * 1000 / max(dt, 1e-9),
    )

    def preprocess_fn(corpus_idx, targets, targets_length, *, rng, train,
                      state=None):
        # Inside a jitted train step the corpus MUST arrive via ``state``
        # (Trainer.preprocess_state): a closure-captured jax.Array becomes
        # an embedded program constant, and a ~2 GB constant overflows
        # remote-compile transports (HTTP 413 on the tunneled TPU). The
        # closure fallback exists for direct host-side calls only.
        feats, flens = state if state is not None else (feats_dev, lens_dev)
        x = jnp.take(feats, corpus_idx, axis=0).astype(jnp.float32)
        xl = jnp.take(flens, corpus_idx, axis=0)
        mask = length_to_mask(xl, x.shape[1])
        if train and noise_std > 0.0:
            rng, r = jax.random.split(rng)
            # mask the padding region: the host path pads with zeros AFTER
            # noising only the valid frames (datasets.py additive noise)
            x = x + (noise_std * jax.random.normal(r, x.shape, x.dtype)
                     * mask[..., None].astype(x.dtype))
        if train and apply_aug:
            x = spec_augment_jax(x, xl, rng, **aug_kwargs)
        return x, mask, targets, targets_length

    return preprocess_fn, (feats_dev, lens_dev)
