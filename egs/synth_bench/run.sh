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
avg_from=10
avg_to=14

if [ "$stage" -le 0 ]; then
  echo "=== stage 0: generate corpus (deterministic seeds) ==="
  python -m opentransformer_tpu.data.synth egs/synth_bench/data
fi

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: train flagship (15 epochs x 312 steps, multi-step scan) ==="
  python run.py -c "$conf" --expdir "$expdir" --log_interval 50
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: average last 5 epochs ==="
  python tools/average.py "$expdir" "$avg_from" "$avg_to"
fi

if [ "$stage" -le 3 ]; then
  echo "=== stage 3: decode test split (beam 5, early exit ON) ==="
  python eval.py -m "$expdir/model.average.from${avg_from}to${avg_to}" \
    -bw 5 -pn 0.6 -ml 32 -b 100 -d test
  cat "$expdir"/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT
fi

if [ "$stage" -le 4 ]; then
  echo "=== stage 4: export trained weights for bench.py ==="
  python tools/export_trained_synth.py \
    "$expdir/model.average.from${avg_from}to${avg_to}" \
    egs/synth_bench/trained/flagship_synth_f16.npz \
    --result "$expdir/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT"
fi
