#!/usr/bin/env bash
# Dataset preprocessing presets (reference preprocess.sh:5-8).
set -e
python -m clip_ebc_tpu.cli.preprocess --dataset shanghaitech_a --src_dir "$1/ShanghaiTech/part_A" --dst_dir data/sha --min_size 448 --max_size 2048
python -m clip_ebc_tpu.cli.preprocess --dataset shanghaitech_b --src_dir "$1/ShanghaiTech/part_B" --dst_dir data/shb --min_size 448 --max_size 2048
python -m clip_ebc_tpu.cli.preprocess --dataset qnrf --src_dir "$1/UCF-QNRF_ECCV18" --dst_dir data/qnrf --min_size 448 --max_size 2048
python -m clip_ebc_tpu.cli.preprocess --dataset nwpu --src_dir "$1/NWPU-Crowd" --dst_dir data/nwpu --min_size 448 --max_size 3072
python -m clip_ebc_tpu.cli.preprocess --dataset jhu --src_dir "$1/jhu_crowd_v2.0" --dst_dir data/jhu --min_size 448 --max_size 4096
