#!/bin/bash
# Training-quality oracle (VERDICT r4 item 1): train SD stage k (mode wct_sd,
# pixel loss only) from the pruned init against the FROZEN converted reference
# SE (weights/16x/e{k}.npz), then score its reconstruction PSNR/SSIM on the
# held-out eval protocol (in1-in4 content, 256px center crops — the same
# protocol that reproduces the shipped SD's rows in docs/PARITY.md) with the
# shipped reference SD (weights/16x/d{k}.npz) as the bar.
#
#   tools/train_student_oracle.sh <stage> <steps> [data_dir] [oracle_root]
#
# Reference recipe being matched: main.py:74-82 (wct_sd over COCO, Adam 1e-4);
# here the data is the in-checkout style/content tiles (COCO is not in the
# container) and the lr rides a cosine decay 1e-3 -> 1e-6, which reaches the
# same pixel-loss floor in ~10k steps instead of ~147k.
set -e
cd "$(dirname "$0")/.."
k=$1; steps=${2:-12000}
data=${3:-/tmp/sd_train/data}
oroot=${4:-/tmp/oracle_root}
shift; shift; shift 2>/dev/null || true; shift 2>/dev/null || true
run=sd${k}_oracle

python -m collaborative_distillation_tpu.cli.train --mode wct_sd --stage "$k" \
  --pretrained_init --SE "weights/16x/e${k}.npz" --lw_perc 0 \
  --lr 1e-3 --lr_final 1e-6 \
  --content_train "$data" --cache_data --batch_size 16 --epoch 99999 \
  --max_steps "$steps" --project_name "$run" --print_interval 200 \
  --save_interval 2000 "$@" > "/tmp/sd${k}_oracle.log" 2>&1
ck=$(ls -t Experiments/*_${run}/weights/2*.npz | head -1)

mkdir -p "$oroot/16x"
for f in e1 e2 e3 e4 e5 d1 d2 d3 d4 d5; do
  [ -f "$oroot/16x/$f.npz" ] || cp "weights/16x/$f.npz" "$oroot/16x/"
done
python -m collaborative_distillation_tpu.cli.export "$ck" --out "$oroot/16x/d${k}.npz"

echo "== stage $k ours (trained, $steps steps) ==" >> /tmp/oracle_results.txt
python -m collaborative_distillation_tpu.cli.eval --mode 16x \
  --images /root/reference/PytorchWCT/content --n_images 4 --size 256 \
  --stages "$k" --weights_root "$oroot" 2>/dev/null | tail -2 >> /tmp/oracle_results.txt
echo "stage $k done: $ck"
