"""Datasets: online audio (wav.scp), kaldi ark, espnet json, LM text.

Capability parity with ``otrans/data/{audio,kaldi,espnet,text}.py``. All
datasets produce ``(utt_id, feature[T, F], feature_length, targets list[int],
targets_length)`` — or ``(utt_id, src_ids, tgt_ids)`` for the text dataset —
and expose ``index_length_pair()`` for the bucketing sampler.

Target tokenization: whitespace units mapped through the vocab with UNK
fallback, exactly like the reference (``audio.py:77-86``).
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Any, Optional

import numpy as np

from . import UNK_TOKEN, load_vocab
from .augment import spec_augment
from .kaldi_io import cmvn_from_stats, load_mat, read_scp
from ..ops.fbank import fbank_numpy, logfbank_psf, normalize_per_utterance, num_frames

logger = logging.getLogger(__name__)


class _RngSpawner:
    """Thread-safe per-sample rng derivation (np.random.Generator is not
    thread safe; the loader's num_workers pool calls __getitem__
    concurrently). One locked draw yields an independent child generator."""

    def __init__(self, rng: Optional[np.random.Generator]):
        self._rng = rng or np.random.default_rng()
        self._lock = threading.Lock()

    def spawn(self) -> np.random.Generator:
        with self._lock:
            seed = int(self._rng.integers(0, 2 ** 63 - 1))
        return np.random.default_rng(seed)


def read_targets(text_files, unit2idx) -> dict[str, list[int]]:
    targets: dict[str, list[int]] = {}
    unk = unit2idx.get(UNK_TOKEN, 2)
    for path in text_files:
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                targets[parts[0]] = [unit2idx.get(c, unk) for c in parts[1:]]
    return targets


def _read_wav(path: str) -> tuple[int, np.ndarray]:
    """wav → (sample_rate, float32 samples scaled to int16 range).

    torchaudio.load returns floats in [-1, 1]; kaldi fbank conventions expect
    int16-range amplitudes. scipy reads raw int16 — we keep that scale (the
    reference's torchaudio path divides by 32768; the absolute scale only
    shifts log-fbank by a constant, normalization removes it).
    """
    import scipy.io.wavfile as siw

    sr, data = siw.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim > 1:
        wav = wav[:, 0]
    return int(sr), wav


class AudioDataset:
    """Online fbank extraction from wav.scp (reference ``data/audio.py``)."""

    def __init__(self, params: Any, datadict: Any, is_eval: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.params = params
        self.is_eval = is_eval
        self._rngs = _RngSpawner(rng)
        self.num_mel_bins = int(params.get("num_mel_bins", 40))
        # 'torchaudio'/'ta' = kaldi-compatible (our first-party kernel);
        # 'psf'/'python_speech_feature' = python_speech_features-style
        self.feature_extractor = params.get("feature_extractor", "torchaudio")
        # extract_on_device: skip host extraction entirely; emit raw
        # waveforms for the jitted device pipeline (data/device_pipeline.py)
        self.return_waveform = bool(params.get("extract_on_device", False)) and not is_eval
        self.normalization = bool(params.get("normalization", False))
        self.apply_spec_augment = bool(params.get("spec_augment", False)) and not is_eval
        # reference quirk preserved: the online dataset ignores
        # spec_augment_config and uses augment-function defaults
        # (audio.py:136 vs kaldi.py:85)
        self.gaussian_noise = float(params.get("gaussian_noise", 0.0)) if not is_eval else 0.0
        self.apply_volume_perturb = bool(params.get("volume_perturb", False)) and not is_eval
        # working speed perturbation (the reference parses the key but its
        # implementation is commented out, otrans/data/audio.py:63-67,105-109)
        self.apply_speed_perturb = bool(params.get("speed_perturb", False)) and not is_eval

        self.apply_global_cmvn = False
        if self.normalization and "global_cmvn" in params:
            base = params["global_cmvn"]
            self.global_mean = np.load(base + ".mean.npy")
            self.global_std = np.load(base + ".std.npy")
            self.apply_global_cmvn = True

        self.unit2idx = load_vocab(params["vocab"])
        self.targets_dict = read_targets(datadict["text"], self.unit2idx)

        self.file_list: list[tuple[str, str]] = []
        for feat_file in datadict["feat"]:
            with open(feat_file, "r", encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) == 2 and parts[0] in self.targets_dict:
                        self.file_list.append((parts[0], parts[1]))
        self.durations = datadict.get("wav-to-duration") if hasattr(datadict, "get") else None

    def __len__(self) -> int:
        return len(self.file_list)

    def __getitem__(self, index: int):
        utt_id, path = self.file_list[index]
        sr, wav = _read_wav(path)
        rng = self._rngs.spawn()
        if self.apply_speed_perturb:
            ratio = rng.choice([0.9, 1.0, 1.1])
            if ratio != 1.0:
                from scipy.signal import resample_poly

                # resampling by 1/ratio changes duration by ratio (kaldi-style
                # sp augmentation: 0.9x/1.1x tempo)
                up, down = (10, 9) if ratio == 0.9 else (10, 11)
                wav = resample_poly(wav, up, down).astype(np.float32)
        if self.apply_volume_perturb:
            wav = wav * 10 ** (rng.uniform(-1.6, 1.6) / 20)
        if self.return_waveform:
            targets = self.targets_dict[utt_id]
            return utt_id, wav.astype(np.float32), len(wav), targets, len(targets)
        if self.feature_extractor in ("psf", "python_speech_feature"):
            feature = logfbank_psf(wav, sample_freq=sr, num_mel_bins=self.num_mel_bins)
        else:
            feature = fbank_numpy(wav, sample_freq=sr, num_mel_bins=self.num_mel_bins)
        if self.normalization:
            if self.apply_global_cmvn:
                feature = (feature - self.global_mean) / self.global_std
            else:
                feature = normalize_per_utterance(feature)
        if self.gaussian_noise > 0.0:
            feature = feature + rng.normal(0.0, self.gaussian_noise, (feature.shape[-1],)).astype(np.float32)
        if self.apply_spec_augment:
            feature = spec_augment(feature, rng=rng)
        targets = self.targets_dict[utt_id]
        return utt_id, feature.astype(np.float32), feature.shape[0], targets, len(targets)

    def index_length_pair(self) -> list[tuple[int, int]]:
        """(index, frame_count) for bucketing — from a wav-to-duration file if
        provided, else by reading wav headers (reference ``audio.py:147-168``)."""
        pairs = []
        dur_map = {}
        if self.durations:
            for p in self.durations if isinstance(self.durations, (list, tuple)) else [self.durations]:
                with open(p, "r", encoding="utf-8") as f:
                    for line in f:
                        utt, dur = line.strip().split()
                        dur_map[utt] = int(float(dur) * 100)  # seconds → 10ms frames
        for i, (utt, path) in enumerate(self.file_list):
            if utt in dur_map:
                pairs.append((i, dur_map[utt]))
            else:
                import wave

                with wave.open(path, "rb") as w:
                    n = w.getnframes()
                    sr = w.getframerate()
                pairs.append((i, num_frames(n, sr)))
        return pairs


class KaldiDataset:
    """Precomputed kaldi features from feat.scp (reference ``data/kaldi.py``)."""

    def __init__(self, params: Any, datadict: Any, is_eval: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.params = params
        self.is_eval = is_eval
        self._rngs = _RngSpawner(rng)
        self.apply_spec_augment = bool(params.get("spec_augment", False)) and not is_eval
        self.spec_augment_config = dict(params.get("spec_augment_config", {}) or {})
        self.max_target_length = int(params.get("max_target_length", 0))
        self.normalization = bool(params.get("normalization", False))
        # train-only additive gaussian noise on the precomputed features —
        # the online dataset's noise augmentation (reference
        # otrans/data/audio.py:131) extended to kaldi features. Fresh noise
        # per read means per-utterance noise cannot be memorized across
        # epochs (the synth_bench corpus relies on this: clean train ark +
        # load-time noise ⇒ the model must learn the mapping, not the noise).
        self.additive_noise_std = (
            float(params.get("additive_noise_std", 0.0)) if not is_eval else 0.0
        )

        self.unit2idx = load_vocab(params["vocab"])
        self.targets_dict = read_targets(datadict["text"], self.unit2idx)

        # optional speaker CMVN: utt2spk + cmvn.scp of kaldi stats
        self.utt2spk: dict[str, str] = {}
        self.spk_cmvn: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if "utt2spk" in datadict and "cmvn" in datadict:
            for p in datadict["utt2spk"]:
                with open(p, "r", encoding="utf-8") as f:
                    for line in f:
                        u, s = line.strip().split()
                        self.utt2spk[u] = s
            for p in datadict["cmvn"]:
                for spk, rx in read_scp(p).items():
                    self.spk_cmvn[spk] = cmvn_from_stats(load_mat(rx))

        self.file_list: list[tuple[str, str]] = []
        for feat_file in datadict["feat"]:
            for utt, rx in read_scp(feat_file).items():
                if utt not in self.targets_dict:
                    continue
                if self.max_target_length and len(self.targets_dict[utt]) > self.max_target_length:
                    continue
                self.file_list.append((utt, rx))
        self.lengths_file = datadict.get("feat-to-len") if hasattr(datadict, "get") else None

    def __len__(self) -> int:
        return len(self.file_list)

    def __getitem__(self, index: int):
        utt_id, rx = self.file_list[index]
        feature = load_mat(rx)
        spk = self.utt2spk.get(utt_id)
        if spk and spk in self.spk_cmvn:
            mean, std = self.spk_cmvn[spk]
            feature = (feature - mean) / std
        elif self.normalization:
            feature = normalize_per_utterance(feature)
        if self.additive_noise_std > 0.0:
            # NOTE: noise is added AFTER any CMVN/normalization above, i.e.
            # it assumes UNNORMALIZED features (synth_bench keeps
            # normalization off and bakes eval-split noise into the arks
            # pre-normalization). Combining additive_noise_std with
            # normalization/cmvn would normalize train features before the
            # noise but eval features after it — don't mix them (ADVICE r3)
            noise_rng = self._rngs.spawn()
            feature = feature + self.additive_noise_std * noise_rng.standard_normal(
                feature.shape
            ).astype(feature.dtype)
        if self.apply_spec_augment:
            feature = spec_augment(feature, rng=self._rngs.spawn(), **self.spec_augment_config)
        targets = self.targets_dict[utt_id]
        return utt_id, feature.astype(np.float32), feature.shape[0], targets, len(targets)

    def target_row(self, index: int):
        """(utt_id, target ids) WITHOUT reading features — the
        device-resident pipeline collates targets host-side but features
        live in HBM (resident.py)."""
        utt_id = self.file_list[index][0]
        return utt_id, self.targets_dict[utt_id]

    def index_length_pair(self) -> list[tuple[int, int]]:
        if self.lengths_file:
            lmap = {}
            for p in self.lengths_file if isinstance(self.lengths_file, (list, tuple)) else [self.lengths_file]:
                with open(p, "r", encoding="utf-8") as f:
                    for line in f:
                        u, n = line.strip().split()
                        lmap[u] = int(n)
            pairs = []
            missing = 0
            for i, (u, rx) in enumerate(self.file_list):
                if u in lmap:
                    pairs.append((i, lmap[u]))
                else:
                    missing += 1
                    pairs.append((i, load_mat(rx).shape[0]))  # fall back to the ark
            if missing:
                logger.warning("feat-to-len missing %d utterances; lengths read from ark", missing)
            return pairs
        return [(i, load_mat(rx).shape[0]) for i, (u, rx) in enumerate(self.file_list)]


class ESPNetDataset:
    """ESPnet data.json format (reference ``data/espnet.py``)."""

    def __init__(self, params: Any, datadict: Any, is_eval: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.params = params
        self.is_eval = is_eval
        self._rngs = _RngSpawner(rng)
        self.apply_spec_augment = bool(params.get("spec_augment", False)) and not is_eval
        self.spec_augment_config = dict(params.get("spec_augment_config", {}) or {})

        self.utts: list[tuple[str, str, list[int], int]] = []
        json_files = datadict["json"] if "json" in datadict else datadict["feat"]
        for jf in json_files:
            with open(jf, "r", encoding="utf-8") as f:
                data = json.load(f)
            for utt_id, info in data["utts"].items():
                feat_rx = info["input"][0]["feat"]
                n_frames = int(info["input"][0]["shape"][0])
                tokenids = [int(t) for t in info["output"][0]["tokenid"].split()]
                self.utts.append((utt_id, feat_rx, tokenids, n_frames))

    def __len__(self) -> int:
        return len(self.utts)

    def __getitem__(self, index: int):
        utt_id, rx, targets, _ = self.utts[index]
        feature = load_mat(rx)
        if self.apply_spec_augment:
            feature = spec_augment(feature, rng=self._rngs.spawn(), **self.spec_augment_config)
        return utt_id, feature.astype(np.float32), feature.shape[0], targets, len(targets)

    def target_row(self, index: int):
        """(utt_id, target ids) without reading features (resident.py)."""
        utt_id, _, targets, _ = self.utts[index]
        return utt_id, targets

    def index_length_pair(self) -> list[tuple[int, int]]:
        return [(i, n) for i, (_, _, _, n) in enumerate(self.utts)]


class TextDataset:
    """Parallel src/tgt token files for LM training (reference ``data/text.py``)."""

    def __init__(self, params: Any, datadict: Any, is_eval: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.src_unit2idx = load_vocab(params["src_vocab"])
        self.tgt_unit2idx = load_vocab(params["tgt_vocab"])
        self.reverse = bool(params.get("reverse", False))
        src_unk = self.src_unit2idx.get(UNK_TOKEN, 2)
        tgt_unk = self.tgt_unit2idx.get(UNK_TOKEN, 2)

        self.src_list: list[tuple[str, list[int]]] = []
        self.tgt_dict: dict[str, list[int]] = {}
        for p in datadict["src"]:
            with open(p, "r", encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if parts:
                        self.src_list.append(
                            (parts[0], [self.src_unit2idx.get(c, src_unk) for c in parts[1:]])
                        )
        for p in datadict["tgt"]:
            with open(p, "r", encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split()
                    if parts:
                        self.tgt_dict[parts[0]] = [self.tgt_unit2idx.get(c, tgt_unk) for c in parts[1:]]

    def __len__(self) -> int:
        return len(self.src_list)

    def __getitem__(self, index: int):
        utt_id, src = self.src_list[index]
        tgt = self.tgt_dict[utt_id]
        if self.reverse:
            src = src[::-1]
            tgt = tgt[::-1]
        return utt_id, src, tgt

    def index_length_pair(self) -> list[tuple[int, int]]:
        return [(i, len(s)) for i, (_, s) in enumerate(self.src_list)]

    @property
    def src_vocab_size(self) -> int:
        return len(self.src_unit2idx)

    @property
    def tgt_vocab_size(self) -> int:
        return len(self.tgt_unit2idx)
