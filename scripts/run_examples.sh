#!/usr/bin/env bash
# Reference training configurations (reference run.sh:5-28), ported.
set -e

# 1. DMCount-EBC VGG-19 on NWPU (448/8/4 fine dmcount)
python -m clip_ebc_tpu.cli.trainer --model vgg19_ae --dataset nwpu \
  --input_size 448 --reduction 8 --truncation 4 --granularity fine \
  --count_loss dmcount --batch_size 16 --amp "$@"

# 2. CLIP-EBC ResNet50, word prompts, on ShanghaiTech A
python -m clip_ebc_tpu.cli.trainer --model clip_resnet50 --dataset sha \
  --input_size 448 --reduction 8 --truncation 4 --prompt_type word \
  --count_loss dmcount --batch_size 16 --amp "$@"

# 3. CLIP-EBC ViT-B/16 + deep VPT on UCF-QNRF, sliding-window eval
python -m clip_ebc_tpu.cli.trainer --model clip_vit_b_16 --dataset qnrf \
  --input_size 224 --reduction 8 --truncation 4 --prompt_type word \
  --num_vpt 32 --count_loss dmcount --batch_size 16 --num_crops 2 \
  --sliding_window --window_size 224 --stride 224 --warmup_lr 1e-3 --amp "$@"
