#!/usr/bin/env python
"""AISHELL-1 data preparation (capability parity with the reference's
``egs/aishell/local/aishell_data_prep.sh`` + ``split_and_norm.py``, done in
python instead of shell/perl).

Walks the extracted OpenSLR-33 layout:
  <corpus>/wav/{train,dev,test}/S*/*.wav
  <corpus>/transcript/aishell_transcript_v0.8.txt

and writes per-split ``wav.scp`` and ``text`` (char-tokenized, full-width →
half-width normalized, uppercased — the reference's normalization).
"""

from __future__ import annotations

import argparse
import os
import unicodedata


def normalize_text(s: str) -> str:
    """Full-width → half-width + uppercase (reference ``split_and_norm.py:6-24``)."""
    out = []
    for ch in s:
        code = ord(ch)
        if code == 0x3000:  # ideographic space
            code = 0x20
        elif 0xFF01 <= code <= 0xFF5E:  # full-width ASCII block
            code -= 0xFEE0
        out.append(chr(code))
    return "".join(out).upper()


def char_tokenize(s: str) -> list[str]:
    """Split into characters; ASCII words stay whole (matches char-unit
    modeling for Mandarin with embedded English/number tokens)."""
    tokens: list[str] = []
    word = ""
    for ch in s:
        if ch.isspace():
            if word:
                tokens.append(word)
                word = ""
        elif ord(ch) < 128:
            word += ch
        else:
            if word:
                tokens.append(word)
                word = ""
            tokens.append(ch)
    if word:
        tokens.append(word)
    return tokens


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("corpus_dir", help="extracted data_aishell directory")
    p.add_argument("out_dir", help="output data directory")
    args = p.parse_args()

    trans_path = os.path.join(args.corpus_dir, "transcript", "aishell_transcript_v0.8.txt")
    transcripts: dict[str, str] = {}
    with open(trans_path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                transcripts[parts[0]] = " ".join(char_tokenize(normalize_text(parts[1])))

    for split in ("train", "dev", "test"):
        wav_root = os.path.join(args.corpus_dir, "wav", split)
        if not os.path.isdir(wav_root):
            print(f"skip {split}: {wav_root} missing")
            continue
        entries = []
        missing = 0
        for dirpath, _, files in os.walk(wav_root):
            for name in sorted(files):
                if not name.endswith(".wav"):
                    continue
                utt = name[:-4]
                if utt not in transcripts:
                    missing += 1
                    continue
                entries.append((utt, os.path.abspath(os.path.join(dirpath, name))))
        entries.sort()
        out = os.path.join(args.out_dir, split)
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "wav.scp"), "w", encoding="utf-8") as f:
            f.writelines(f"{u} {p}\n" for u, p in entries)
        with open(os.path.join(out, "text"), "w", encoding="utf-8") as f:
            f.writelines(f"{u} {transcripts[u]}\n" for u, _ in entries)
        print(f"{split}: {len(entries)} utts ({missing} without transcript dropped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
