#!/usr/bin/env bash
# Short controlled ablations for the r3 flagship collapse (VERDICT r4 #1):
# 3 epochs each at the synth_bench geometry, per-epoch dev loss + greedy
# CER probe. Variants isolate the two confounds of the r3 postmortem:
#
#   bf16_noam  - r3c recipe (Noam factor 0.5 / warmup 1500, peak ~8.1e-4),
#                bf16: the KNOWN-collapsing configuration
#   f32_noam   - same schedule in f32: does full precision survive the
#                high-lr window? (isolates dtype)
#   bf16_lr3e4 - capped lr (the round-4 recipe), bf16: isolates lr
#   bf16_lr3e4_noaug - capped lr without SpecAugment/load-noise (isolates
#                augmentation; expected to memorize eventually but must
#                LEARN early)
#
# Collapse signature (from the r3c log): att loss pinned at ~5.2-5.4 and
# ctc at ~5.73 (the unigram prior) by step ~900 with dev greedy CER ~100%.
# Learning signature: att < 4.5 and falling + dev CER < 90% by epoch 2.
#
#   bash egs/synth_bench/ablate.sh [outdir]
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

outdir=${1:-/tmp/synth_ablate}
mkdir -p "$outdir"
conf=egs/synth_bench/conf/flagship.yaml

variant() { # name python-config-mutation
  local name=$1 mut=$2
  python - "$conf" "$outdir/$name.yaml" "$mut" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["train"]["epochs"] = 3
exec(sys.argv[3])
yaml.safe_dump(cfg, open(sys.argv[2], "w"))
EOF
}

noam='cfg["train"]["scheduler_type"]="transformer"; cfg["train"]["scheduler"]={"model_size":256,"warmup_steps":1500,"factor":0.5}'
variant bf16_noam "$noam"
variant f32_noam "$noam; cfg[\"train\"][\"dtype\"]=\"float32\""
variant bf16_lr3e4 "pass"
variant bf16_lr3e4_noaug 'cfg["data"]["spec_augment"]=False; cfg["data"]["additive_noise_std"]=0.0'

for name in bf16_noam f32_noam bf16_lr3e4 bf16_lr3e4_noaug; do
  echo "=== ablation: $name ==="
  python run.py -c "$outdir/$name.yaml" --expdir "$outdir/exp_$name" \
    --log_interval 50 2>&1 | grep -E "Training-Epoch|dev loss|dev greedy|parameters" \
    | tee "$outdir/$name.summary"
done
echo "=== done; summaries in $outdir/*.summary ==="
