#!/usr/bin/env bash
# Synthetic benchmark recipe at the flagship geometry: generate the
# deterministic corpus (opentransformer_tpu/data/synth.py), train the
# flagship speech-transformer on the real chip, average the last
# checkpoints, decode the held-out test split (early exit ON), and report
# CER + RTF — the quality half of BENCH (bench.py reads the exported
# weights from egs/synth_bench/trained/).
#
#   bash egs/synth_bench/run.sh [stage]
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

stage=${1:-0}
expdir=egs/synth_bench/exp
conf=egs/synth_bench/conf/flagship.yaml

if [ "$stage" -le 0 ]; then
  echo "=== stage 0: generate corpus (deterministic seeds) ==="
  python -m opentransformer_tpu.data.synth egs/synth_bench/data
fi

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: train flagship (warmup->3e-4 hold, 15 epochs x 312 steps) ==="
  python run.py -c "$conf" --expdir "$expdir" --log_interval 50
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: continue at lr 1e-4 to epoch 40, average 35-39, decode, export ==="
  # continue.sh also averages the last 5 epochs, decodes the test split
  # (CER 0.04% on the 2026-08-20 run) and exports the bench.py weights
  bash egs/synth_bench/continue.sh 40
fi
