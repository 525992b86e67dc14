#!/usr/bin/env python
"""Compute global CMVN (mean/std .npy pair) over a wav.scp or feat.scp.

The online dataset consumes ``<prefix>.mean.npy`` / ``<prefix>.std.npy``
(reference ``otrans/data/audio.py:43-47``). This tool produces them from
either raw wavs (runs the fbank frontend) or precomputed kaldi features.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from opentransformer_tpu.data.kaldi_io import load_mat, read_scp  # noqa: E402
from opentransformer_tpu.data.datasets import _read_wav  # noqa: E402
from opentransformer_tpu.ops.fbank import fbank_numpy  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("scp", help="wav.scp or feat.scp")
    p.add_argument("out_prefix", help="writes <prefix>.mean.npy and <prefix>.std.npy")
    p.add_argument("--kind", choices=["wav", "feat"], default="wav")
    p.add_argument("--num_mel_bins", type=int, default=40)
    p.add_argument("--max_utts", type=int, default=0)
    args = p.parse_args()

    total = None
    total_sq = None
    count = 0
    for i, (utt, rx) in enumerate(read_scp(args.scp).items()):
        if args.max_utts and i >= args.max_utts:
            break
        if args.kind == "wav":
            sr, wav = _read_wav(rx)
            feat = fbank_numpy(wav, sample_freq=sr, num_mel_bins=args.num_mel_bins)
        else:
            feat = load_mat(rx)
        if total is None:
            total = feat.sum(axis=0).astype(np.float64)
            total_sq = (feat ** 2).sum(axis=0).astype(np.float64)
        else:
            total += feat.sum(axis=0)
            total_sq += (feat ** 2).sum(axis=0)
        count += feat.shape[0]

    mean = (total / count).astype(np.float32)
    std = np.sqrt(np.maximum(total_sq / count - mean.astype(np.float64) ** 2, 1e-10)).astype(np.float32)
    np.save(args.out_prefix + ".mean.npy", mean)
    np.save(args.out_prefix + ".std.npy", std)
    print(f"cmvn over {count} frames -> {args.out_prefix}.{{mean,std}}.npy")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
