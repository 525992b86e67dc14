#!/usr/bin/env bash
# Continue flagship training (epochs 15-27, decayed lr) from the newest
# checkpoint in the expdir, then average/decode/export the final window.
#   bash egs/synth_bench/continue.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

expdir=egs/synth_bench/exp
conf=egs/synth_bench/conf/flagship_cont.yaml
avg_from=23
avg_to=27

echo "=== continue: epochs 15-27 at lr 1e-4 ==="
python run.py -c "$conf" --expdir "$expdir" --log_interval 50 -ct

echo "=== average ${avg_from}-${avg_to} ==="
python tools/average.py "$expdir" "$avg_from" "$avg_to"

echo "=== decode test split ==="
python eval.py -m "$expdir/model.average.from${avg_from}to${avg_to}" \
  -bw 5 -pn 0.6 -ml 32 -b 100 -d test
cat "$expdir"/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT

echo "=== export trained weights for bench.py ==="
python tools/export_trained_synth.py \
  "$expdir/model.average.from${avg_from}to${avg_to}" \
  egs/synth_bench/trained/flagship_synth_f16.npz \
  --result "$expdir/decode_test_bw5_pn0.6_ml32_avg${avg_from}-${avg_to}/RESULT"
