#!/usr/bin/env bash
# Train the tracked ANCHOR model (small d128 speech2text, conf/anchor.yaml)
# on the synthetic corpus, average the last checkpoints, decode the test
# split, and export the f16 npz that IS committed to git — a fresh checkout
# then always produces an at-parity bench headline (bench.py row 2) without
# the 1.5 h flagship regeneration.
#
#   bash egs/synth_bench/anchor.sh [stage] [end_epoch]
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

stage=${1:-0}
end_epoch=${2:-80}
expdir=egs/synth_bench/exp_anchor
conf=egs/synth_bench/conf/anchor.yaml
avg_to=$((end_epoch - 1))
avg_from=$((end_epoch - 5))

if [ "$stage" -le 0 ] && [ ! -f egs/synth_bench/data/vocab ]; then
  echo "=== stage 0: generate corpus (deterministic seeds) ==="
  python -m opentransformer_tpu.data.synth egs/synth_bench/data
fi

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: train anchor (${end_epoch} epochs) ==="
  tmpconf=$(mktemp /tmp/anchor_XXXX.yaml)
  sed "s/^  epochs: .*/  epochs: ${end_epoch}/" "$conf" > "$tmpconf"
  python run.py -c "$tmpconf" --expdir "$expdir" --log_interval 50
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: average ${avg_from}-${avg_to}, decode test, export ==="
  python tools/average.py "$expdir" "$avg_from" "$avg_to"
  python eval.py -m "$expdir/model.average.from${avg_from}to${avg_to}" \
    -bw 5 -pn 0.6 -ml 32 -b 100 -d test
  cat "$expdir"/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT
  python tools/export_trained_synth.py \
    "$expdir/model.average.from${avg_from}to${avg_to}" \
    egs/synth_bench/trained/anchor_synth_f16.npz \
    --result "$expdir/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT" \
    --embed-model-cfg --regenerate "bash egs/synth_bench/anchor.sh"
  echo "=== commit egs/synth_bench/trained/anchor_synth_f16.npz (+manifest) ==="
fi
