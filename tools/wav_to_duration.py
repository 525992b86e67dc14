#!/usr/bin/env python
"""Write a ``wav-to-duration`` file (utt seconds) from a wav.scp — consumed
by the bucketing sampler to avoid reading every wav for lengths
(reference ``otrans/data/audio.py:147-168``)."""

import sys
import wave


def main() -> int:
    if len(sys.argv) != 3:
        print("usage: wav_to_duration.py wav.scp out_file")
        return 1
    with open(sys.argv[1], "r", encoding="utf-8") as fin, open(
        sys.argv[2], "w", encoding="utf-8"
    ) as fout:
        for line in fin:
            parts = line.strip().split()
            if len(parts) != 2:
                continue
            utt, path = parts
            with wave.open(path, "rb") as w:
                dur = w.getnframes() / w.getframerate()
            fout.write(f"{utt} {dur:.3f}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
