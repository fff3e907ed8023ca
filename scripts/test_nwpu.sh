#!/usr/bin/env bash
# NWPU submission generation (reference test_nwpu.sh:4-7).
set -e
python -m clip_ebc_tpu.cli.test_nwpu --model clip_vit_b_16 --input_size 224 \
  --reduction 8 --truncation 4 --prompt_type word --sliding_window "$@"
