"""CLI argument-surface tests (no training)."""

import math

import pytest

from clip_ebc_tpu.cli.trainer import build_parser, config_from_args


def parse(argv):
    return build_parser().parse_args(argv)


def test_headline_vgg_config():
    # reference run.sh config 1: vgg19_ae 448/8/4 dmcount on nwpu
    args = parse(
        "--model vgg19_ae --dataset nwpu --input_size 448 --reduction 8 "
        "--truncation 4 --count_loss dmcount --batch_size 16 --amp".split()
    )
    cfg = config_from_args(args)
    assert cfg.model == "vgg19_ae" and cfg.dataset == "nwpu"
    assert len(cfg.bins) == 5 and cfg.bins[-1][1] == math.inf


def test_headline_clip_vit_config():
    # reference run.sh config 3: clip_vit_b_16 224/8/4, sliding window 224/224
    args = parse(
        "--model clip_vit_b_16 --dataset qnrf --input_size 224 --reduction 8 "
        "--truncation 4 --num_vpt 32 --prompt_type word --count_loss dmcount "
        "--batch_size 16 --num_crops 2 --sliding_window --warmup_lr 1e-3".split()
    )
    cfg = config_from_args(args)
    assert cfg.sliding_window and cfg.window_size == 224 and cfg.stride == 224
    assert cfg.num_vpt == 32 and cfg.prompt_type == "word"


def test_regression_nulls_bins():
    args = parse("--model vgg19_ae --dataset shb --regression".split())
    cfg = config_from_args(args)
    assert cfg.bins is None and cfg.truncation is None


def test_conflicting_multiple_flags_rejected():
    args = parse(
        "--model vgg19_ae --dataset shb --truncation 4 --sliding_window "
        "--resize_to_multiple --zero_pad_to_multiple".split()
    )
    with pytest.raises(ValueError):
        config_from_args(args)


def test_defaults_match_reference():
    args = parse("--dataset shb --truncation 4".split())
    # reference trainer.py defaults (lines 22-85)
    assert args.lr == 1e-4 and args.weight_decay == 1e-4
    assert args.warmup_epochs == 50 and args.warmup_lr == 1e-6
    assert args.T_0 == 5 and args.T_mult == 2 and args.eta_min == 1e-7
    assert args.total_epochs == 2600 and args.eval_start == 50
    assert args.save_best_k == 3 and args.num_crops == 1
    assert args.min_scale == 1.0 and args.max_scale == 2.0
    assert args.hue == 0.0  # the NaN-avoidance default (reference trainer.py:46)


def test_nwpu_parser_stride_default():
    from clip_ebc_tpu.cli.test_nwpu import build_parser as nwpu_parser

    args = nwpu_parser().parse_args(
        "--weight_path x --sliding_window --input_size 224".split()
    )
    # stride defaults to window//2 in the NWPU driver (reference test_nwpu.py:75)
    assert args.stride is None  # resolved in main(); just check flag exists
