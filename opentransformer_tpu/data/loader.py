"""FeatureLoader facade: dataset selection, collate, prefetch, sharding.

Parity surface (reference ``otrans/data/loader.py``):
  * registry {'online', 'kaldi', 'espnet', 'text'} keyed by
    ``data.dataset_type``
  * speech collate: zero-padded features, targets wrapped
    BOS ⧺ y ⧺ EOS ⧺ PAD…, bool masks, ``targets_length = len(y) + 1``
    (counts EOS, not BOS) — ``loader.py:66-108``
  * text collate: src = BOS ⧺ tokens, tgt = tokens ⧺ EOS — ``loader.py:24-63``
  * ``set_epoch`` reshuffles buckets; background-thread prefetch
    (``data/generator.py``); multi-host sharding replaces DistributedSampler

XLA-static shapes: features pad to the batch's bucket boundary; target
length pads to a fixed quantum (multiple of ``target_pad_multiple``), so
compiled-shape count stays bounded (see ``bucket.py``).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Iterator, Optional

import numpy as np

from . import BOS, EOS, PAD
from .bucket import BySequenceLengthSampler, DEFAULT_BOUNDARIES
from .datasets import AudioDataset, ESPNetDataset, KaldiDataset, TextDataset

logger = logging.getLogger(__name__)

_truncation_warnings = 0  # rate-limit the collate truncation warning

Dataset = {
    "online": AudioDataset,
    "kaldi": KaldiDataset,
    "espnet": ESPNetDataset,
    "text": TextDataset,
}


def quantize(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def collate_targets(tgts, ulens, target_pad_multiple: int = 8):
    """Target ids → (BOS ⧺ y ⧺ EOS ⧺ PAD…, bool mask, targets_length=len+1),
    padded to a fixed quantum — shared by the host collate and the
    device-resident pipeline (features live in HBM, targets stay host-side)."""
    b = len(tgts)
    u_max = quantize(max(ulens) + 2, target_pad_multiple)  # BOS + y + EOS
    y = np.full((b, u_max), PAD, np.int32)
    y_mask = np.zeros((b, u_max), bool)
    for i in range(b):
        y[i, 0] = BOS
        y[i, 1 : 1 + ulens[i]] = tgts[i]
        y[i, 1 + ulens[i]] = EOS
        y_mask[i, : ulens[i] + 2] = True
    return {
        "targets": y,
        "targets_length": np.asarray(ulens, np.int32) + 1,  # + EOS, no BOS
        "mask": y_mask,
    }


def collate_speech(samples, pad_to_frames: Optional[int] = None, target_pad_multiple: int = 8):
    """[(utt, feat[T,F], T, targets, U)] → (utt_ids, inputs dict, targets dict)."""
    utt_ids = [s[0] for s in samples]
    feats = [s[1] for s in samples]
    tlens = [s[2] for s in samples]
    tgts = [s[3] for s in samples]
    ulens = [s[4] for s in samples]

    b = len(samples)
    f = feats[0].shape[1]
    t_max = pad_to_frames or max(tlens)
    # The sampler guarantees max(tlens) <= pad_to_frames (over-long
    # utterances get quantized pseudo-boundaries, bucket.py); truncate
    # defensively rather than exceed the bucket shape and mint a fresh
    # XLA compile per odd batch — but never silently: dropped frames mean
    # the sampler saw a shorter length than the extractor produced (e.g. a
    # rounded-down durations file), which degrades those utterances.
    if any(t > t_max for t in tlens):
        global _truncation_warnings
        if _truncation_warnings < 5:
            _truncation_warnings += 1
            worst = max(tlens)
            logger.warning(
                "collate: truncating %d utterance(s) to the bucket shape "
                "(%d > pad_to_frames=%d; e.g. %s) — sampler length metadata "
                "is shorter than the extracted features%s",
                sum(t > t_max for t in tlens), worst, t_max,
                utt_ids[int(np.argmax(tlens))],
                "" if _truncation_warnings < 5 else "; suppressing further warnings")
        tlens = [min(t, t_max) for t in tlens]
    x = np.zeros((b, t_max, f), np.float32)
    x_mask = np.zeros((b, t_max), bool)
    for i in range(b):
        x[i, : tlens[i]] = feats[i][: tlens[i]]
        x_mask[i, : tlens[i]] = True

    inputs = {
        "inputs": x,
        "inputs_length": np.asarray(tlens, np.int32),
        "mask": x_mask,
    }
    return utt_ids, inputs, collate_targets(tgts, ulens, target_pad_multiple)


def collate_text(samples, target_pad_multiple: int = 8):
    """[(utt, src_ids, tgt_ids)] → src = BOS⧺tokens, tgt = tokens⧺EOS."""
    utt_ids = [s[0] for s in samples]
    srcs = [s[1] for s in samples]
    tgts = [s[2] for s in samples]
    b = len(samples)
    u_max = quantize(max(len(s) for s in srcs) + 1, target_pad_multiple)

    src = np.full((b, u_max), PAD, np.int32)
    tgt = np.full((b, u_max), PAD, np.int32)
    mask = np.zeros((b, u_max), bool)
    lens = np.zeros((b,), np.int32)
    for i in range(b):
        n = len(srcs[i])
        src[i, 0] = BOS
        src[i, 1 : 1 + n] = srcs[i]
        tgt[i, :n] = tgts[i]
        tgt[i, n] = EOS
        mask[i, : n + 1] = True
        lens[i] = n + 1
    inputs = {"inputs": src, "inputs_length": lens, "mask": mask}
    targets = {"targets": tgt, "targets_length": lens, "mask": mask}
    return utt_ids, inputs, targets


class _Prefetcher:
    """Background-thread prefetch (reference ``data/generator.py``: queue 10).

    The worker checks a stop flag on every bounded put so abandoning the
    iterator early (eval -ns, init_state's single batch) releases the thread
    instead of leaking it blocked on a full queue."""

    def __init__(self, gen_fn, max_prefetch: int = 10):
        self.gen_fn = gen_fn
        self.max_prefetch = max_prefetch

    def __iter__(self):
        q: queue.Queue = queue.Queue(self.max_prefetch)
        sentinel = object()
        stop = threading.Event()

        def put_bounded(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.gen_fn():
                    if not put_bounded(item):
                        return
            finally:
                # the sentinel MUST eventually land (a dropped sentinel
                # deadlocks the consumer at epoch end); bounded put keeps
                # retrying until delivered or the consumer abandoned us
                put_bounded(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()


class FeatureLoader:
    """Builds the dataset + sampler and yields collated batches.

    Args mirror the reference (``data/loader.py:112-166``): ``params`` is the
    full config, ``name`` the data split ('train'/'test'/...), ``is_eval``
    disables augmentation.

    Multihost (``num_shards``/``shard_id``, the DistributedSampler
    replacement): every host iterates the SAME batch sequence (identical
    sampler seed) and takes its row-slice of each batch, so all hosts see
    the same step count and the same padded shapes — a requirement for SPMD
    collectives over a global mesh. The trainer assembles the global array
    from the per-host slices.
    """

    def __init__(
        self,
        params: Any,
        name: str = "train",
        is_eval: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
        batch_size: Optional[int] = None,
        seed: int = 0,
    ):
        data_cfg = params["data"] if "data" in params else params
        self.data_cfg = data_cfg
        dtype_name = data_cfg.get("dataset_type", "kaldi")
        if dtype_name not in Dataset:
            raise KeyError(f"unknown dataset_type {dtype_name!r}")
        self.dataset_type = dtype_name
        self.is_text = dtype_name == "text"
        self.is_eval = is_eval
        self.num_shards = max(int(num_shards), 1)
        self.shard_id = int(shard_id)
        self.target_pad_multiple = int(data_cfg.get("target_pad_multiple", 8))
        # parallel sample fetching (host fbank extraction / ark reads release
        # the GIL in numpy); reference uses DataLoader workers (num_workers)
        self.num_workers = int(data_cfg.get("num_workers", 0))

        datadict = data_cfg[name]
        rng = np.random.default_rng(seed)
        self.dataset = Dataset[dtype_name](data_cfg, datadict, is_eval=is_eval, rng=rng)
        # decode reads features via the host path; on-device extraction is a
        # training-pipeline optimization (eval.py consumes inputs/mask)
        self.extract_on_device = (
            bool(data_cfg.get("extract_on_device", False))
            and dtype_name == "online"
            and not is_eval
        )
        # device-resident corpus (resident.py): precomputed-feature train
        # splits ship [B] int32 gather indices instead of padded features —
        # the corpus lives in HBM. Train-only, single-process (each multihost
        # process would need its own shard upload — not implemented).
        want_resident = bool(data_cfg.get("device_resident", False)) and not is_eval
        self.device_resident = (
            want_resident and dtype_name in ("kaldi", "espnet") and self.num_shards == 1
        )
        if want_resident and not self.device_resident:
            logger.warning(
                "device_resident requested but unsupported here "
                "(dataset_type=%s, num_shards=%d) — using the host path",
                dtype_name, self.num_shards)

        self.batch_size = int(batch_size or data_cfg.get("batch_size", 16))
        bucket_cfg = data_cfg.get("bucket", None)
        pairs = self.dataset.index_length_pair()
        if bucket_cfg and not self.is_text:
            self.sampler = BySequenceLengthSampler(
                pairs,
                bucket_boundaries=bucket_cfg.get("bucket_boundaries", DEFAULT_BOUNDARIES),
                batch_size=self.batch_size,
                bucket_batch_sizes=bucket_cfg.get("bucket_batch_size", None) or None,
                max_frames_one_batch=bucket_cfg.get("max_frames_one_batch", 0)
                if bucket_cfg.get("audo_set_batch_size", bucket_cfg.get("auto_set_batch_size", False))
                else 0,
                rm_the_long_sents=bucket_cfg.get("rm_the_long_sents", False),
                drop_last=bucket_cfg.get("drop_last", False),
                seed=seed,
                overlong_pad_multiple=bucket_cfg.get("overlong_pad_multiple", 256),
            )
        else:
            # simple length-sorted static batching: sort by length so batch
            # padding is tight, quantize pad target to a frame multiple
            order = [i for i, _ in sorted(pairs, key=lambda p: p[1])]
            lengths = {i: l for i, l in pairs}
            self.sampler = _SimpleSampler(order, lengths, self.batch_size, seed=seed,
                                          frame_multiple=int(data_cfg.get("frame_pad_multiple", 32)))
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.sampler)

    def build_resident_corpus(self, storage_dtype: Optional[str] = None):
        """Read the whole corpus (augmentation OFF — it moves on-device) into
        a padded [N, T_max, D] array + [N] lengths for one-time HBM upload.
        T_max covers the largest bucket boundary, so resident batches share
        ONE compile signature at that corpus-max shape (the host path pads
        per bucket boundary — different programs; masks make the padded
        frames inert either way)."""
        if not self.device_resident:
            raise RuntimeError("loader is not in device_resident mode")
        from .resident import build_corpus

        storage_dtype = storage_dtype or str(
            self.data_cfg.get("device_resident_dtype", "float16"))
        bucket_cfg = self.data_cfg.get("bucket", None)
        if bucket_cfg and not self.is_text:
            boundaries = bucket_cfg.get("bucket_boundaries", DEFAULT_BOUNDARIES)
            pad_to = max(boundaries)
            pad_multiple = int(bucket_cfg.get("overlong_pad_multiple", 256))
        else:
            pad_to = 0
            pad_multiple = int(self.data_cfg.get("frame_pad_multiple", 32))
        ds = self.dataset
        saved = (getattr(ds, "apply_spec_augment", False),
                 getattr(ds, "additive_noise_std", 0.0))
        ds.apply_spec_augment = False
        if hasattr(ds, "additive_noise_std"):
            ds.additive_noise_std = 0.0
        try:
            return build_corpus(ds, pad_to_frames=pad_to,
                                pad_multiple=pad_multiple,
                                storage_dtype=storage_dtype)
        finally:
            ds.apply_spec_augment = saved[0]
            if hasattr(ds, "additive_noise_std"):
                ds.additive_noise_std = saved[1]

    def _resident_batch(self, idxs):
        """(utt_ids, {corpus_idx}, target dict) — features stay in HBM."""
        rows = [self.dataset.target_row(i) for i in idxs]
        utt_ids = [u for u, _ in rows]
        tgts = [t for _, t in rows]
        ulens = [len(t) for t in tgts]
        inputs = {"corpus_idx": np.asarray(idxs, np.int32)}
        return utt_ids, inputs, collate_targets(tgts, ulens, self.target_pad_multiple)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.sampler.set_epoch(epoch)

    def _iter_batches(self):
        pool = None
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
        for bi, (boundary, idxs) in enumerate(self.sampler):
            if self.num_shards > 1:
                # row-slice: same #batches and shapes on every host; if this
                # batch has fewer rows than hosts, repeat row 0 (rare tail)
                sliced = idxs[self.shard_id :: self.num_shards]
                idxs = sliced if sliced else [idxs[0]]
            if self.device_resident:
                yield self._resident_batch(idxs)
                continue
            if pool is not None:
                samples = list(pool.map(self.dataset.__getitem__, idxs))
            else:
                samples = [self.dataset[i] for i in idxs]
            if self.is_text:
                yield collate_text(samples, self.target_pad_multiple)
            elif self.extract_on_device:
                from .device_pipeline import collate_waveforms

                yield collate_waveforms(samples)
            else:
                yield collate_speech(samples, pad_to_frames=boundary,
                                     target_pad_multiple=self.target_pad_multiple)

    @property
    def loader(self):
        return _Prefetcher(self._iter_batches)

    def __iter__(self) -> Iterator:
        return iter(self.loader)


class _SimpleSampler:
    """Length-sorted fixed-size batches with quantized pad lengths."""

    def __init__(self, order, lengths, batch_size, seed=0, frame_multiple=32):
        self.order = order
        self.lengths = lengths
        self.batch_size = batch_size
        self.seed = seed
        self.frame_multiple = frame_multiple
        self.epoch = 0
        self._regen()

    def _regen(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        batches = []
        for s in range(0, len(self.order), self.batch_size):
            chunk = self.order[s : s + self.batch_size]
            max_len = max(self.lengths[i] for i in chunk)
            boundary = ((max_len + self.frame_multiple - 1) // self.frame_multiple) * self.frame_multiple
            batches.append((boundary, chunk))
        perm = rng.permutation(len(batches))
        self.batches = [batches[i] for i in perm]

    def set_epoch(self, epoch):
        self.epoch = epoch
        self._regen()

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)
