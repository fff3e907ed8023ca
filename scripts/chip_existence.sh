#!/bin/bash
# Chip-scale CLIP existence proof + trained-weights int8 sweep
# (STATUS.md chip playbook steps 4-5). Run ONLY when the axon relay is
# up; one TPU job at a time (concurrent relay jobs corrupt timings).
#
#   bash scripts/chip_existence.sh [outdir]
#
# Produces in $outdir: pretrain ckpt + info, fine-tune run json + ckpt,
# scratch control json, trained-weights int8 sweep json.
set -ex
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_r4}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon

python scripts/pretrain_clip_synthetic.py \
  --steps 1500 --dataset shb --input_size 224 --batch_size 32 \
  --dataset_size 1024 --dtype bfloat16 \
  --out "$OUT/clip_pre224.npz" --info_out "$OUT/clip_pre224_info.json" \
  > "$OUT/pretrain.log" 2>&1

python scripts/convergence_run.py \
  --model clip_vit_b_16 --input_size 224 --batch_size 32 --epochs 60 \
  --T_0 55 --T_mult 1 --n_train 192 --n_val 24 --num_vpt 32 \
  --sliding_window --pretrained "$OUT/clip_pre224.npz" \
  --save_ckpt "$OUT/clip_ft224.npz" \
  --out "$OUT/conv_clip224_pre.json" > "$OUT/ft.log" 2>&1

python scripts/convergence_run.py \
  --model clip_vit_b_16 --input_size 224 --batch_size 32 --epochs 60 \
  --T_0 55 --T_mult 1 --n_train 192 --n_val 24 --num_vpt 32 \
  --sliding_window \
  --out "$OUT/conv_clip224_scratch.json" > "$OUT/scratch.log" 2>&1

python scripts/int8_accuracy.py \
  --ckpt "$OUT/clip_ft224.npz" --bins_dataset shb \
  --out "$OUT/int8_accuracy_trained.json" > "$OUT/int8.log" 2>&1

echo done > "$OUT/chip_existence.done"
