#!/usr/bin/env bash
# Continue flagship training at a decayed constant lr (1e-4) from the newest
# checkpoint in the expdir, then average/decode/export the final window.
#
#   bash egs/synth_bench/continue.sh [end_epoch]
#
# end_epoch (default 40, exclusive — matches train.epochs semantics) is
# parameterized so the continuation can be sized to the wall-clock that is
# actually available: epochs cost ~1.5-16 min each depending on host vCPUs
# (the data pipeline is host-bound on 1-vCPU machines, CLAUDE.md), and a
# SHORT continuation that finishes beats a long one that gets killed before
# its stage-4 export. The averaging window is the last 5 trained epochs.
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

end_epoch=${1:-40}
expdir=egs/synth_bench/exp
conf=egs/synth_bench/conf/flagship_cont.yaml
avg_to=$((end_epoch - 1))
avg_from=$((end_epoch - 5))

tmpconf=$(mktemp /tmp/flagship_cont_XXXX.yaml)
sed "s/^  epochs: .*/  epochs: ${end_epoch}/" "$conf" > "$tmpconf"

echo "=== continue: epochs ..${avg_to} at lr 1e-4 (conf: $tmpconf) ==="
python run.py -c "$tmpconf" --expdir "$expdir" --log_interval 50 -ct

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
