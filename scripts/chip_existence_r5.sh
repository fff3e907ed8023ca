#!/bin/bash
# Trimmed round-5 chip existence chain (VERDICT r4 item 2): 224px bf16
# CLIP pretrain -> frozen-text fine-tune -> scratch control ->
# trained-weights int8 sweep, sized to fit the remaining relay window.
# Each stage has its own hard timeout so a relay hang cannot eat the
# round; stages already produced are kept (rerun-safe).
#
#   bash scripts/chip_existence_r5.sh [outdir]
#
# One TPU job at a time: do NOT run this concurrently with bench jobs.
set -ex
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_r5}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon

if [ ! -f "$OUT/clip_pre224.npz" ]; then
  timeout -s KILL 1500 python scripts/pretrain_clip_synthetic.py \
    --steps 700 --dataset shb --input_size 224 --batch_size 32 \
    --dataset_size 512 --dtype bfloat16 \
    --out "$OUT/clip_pre224.npz" --info_out "$OUT/clip_pre224_info.json" \
    > "$OUT/pretrain.log" 2>&1
fi

if [ ! -f "$OUT/conv_clip224_pre.json" ]; then
  timeout -s KILL 2100 python scripts/convergence_run.py \
    --model clip_vit_b_16 --input_size 224 --batch_size 32 --epochs 25 \
    --T_0 22 --T_mult 1 --n_train 128 --n_val 24 --num_vpt 32 \
    --eval_freq 1 --sliding_window --pretrained "$OUT/clip_pre224.npz" \
    --save_ckpt "$OUT/clip_ft224.npz" \
    --out "$OUT/conv_clip224_pre.json" > "$OUT/ft.log" 2>&1
fi

if [ ! -f "$OUT/int8_accuracy_trained.json" ]; then
  timeout -s KILL 1200 python scripts/int8_accuracy.py \
    --ckpt "$OUT/clip_ft224.npz" --bins_dataset shb \
    --out "$OUT/int8_accuracy_trained.json" > "$OUT/int8.log" 2>&1
fi

if [ ! -f "$OUT/conv_clip224_scratch.json" ]; then
  timeout -s KILL 2100 python scripts/convergence_run.py \
    --model clip_vit_b_16 --input_size 224 --batch_size 32 --epochs 25 \
    --T_0 22 --T_mult 1 --n_train 128 --n_val 24 --num_vpt 32 \
    --eval_freq 1 --sliding_window \
    --out "$OUT/conv_clip224_scratch.json" > "$OUT/scratch.log" 2>&1
fi

echo done > "$OUT/chip_existence.done"
