"""Synthetic count-supervised CLIP pretraining driver (VERDICT r3 item 3).

Pretrains the joint Clip (image + text towers, models/clip/clip_model.py)
on rendered crowd crops paired with the EBC bin prompts, then writes the
prepared .npz artifact the trainer / convergence_run consume via
--pretrained. The follow-up fine-tune is the existence proof that the
flagship frozen-text cosine head trains end-to-end:

    PYTHONPATH=/root/repo python scripts/pretrain_clip_synthetic.py \
        --steps 1500 --out /tmp/clip_pretrain_vit_b_16.npz
    PYTHONPATH=/root/repo python scripts/convergence_run.py \
        --model clip_vit_b_16 --input_size 224 --batch_size 32 \
        --sliding_window --pretrained /tmp/clip_pretrain_vit_b_16.npz \
        --out CONVERGENCE_r04_CLIP_pretrained.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", type=str, default="vit_b_16")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dataset_size", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reduction", type=int, default=8)
    p.add_argument("--truncation", type=int, default=4)
    p.add_argument("--dataset", type=str, default="qnrf",
                   help="bins table to draw the prompt vocabulary from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--text_spread", type=float, default=1.0,
                   help="weight of the off-diagonal text-cosine penalty "
                   "(see training/clip_pretrain.PretrainConfig)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="float32 for CPU-scale runs (bf16 is emulated "
                   "in software on the host)")
    p.add_argument("--out", type=str, default="/tmp/clip_pretrain.npz")
    p.add_argument("--info_out", type=str, default=None)
    args = p.parse_args()

    from clip_ebc_tpu.config import get_bins_and_anchors
    from clip_ebc_tpu.training.clip_pretrain import (
        PretrainConfig, pretrain_clip, save_pretrained,
    )

    bins, _ = get_bins_and_anchors(
        reduction=args.reduction, truncation=args.truncation,
        dataset=args.dataset, granularity="fine", anchor_points="average",
    )
    cfg = PretrainConfig(
        backbone=args.backbone, input_size=args.input_size, bins=tuple(bins),
        steps=args.steps, batch_size=args.batch_size,
        dataset_size=args.dataset_size, lr=args.lr, seed=args.seed,
        dtype=args.dtype, text_spread=args.text_spread,
    )
    print(f"rendering {cfg.dataset_size} crops at {cfg.input_size}px over "
          f"{len(bins)} count bins ...", flush=True)
    t0 = time.time()
    variables, info = pretrain_clip(cfg, progress=True)
    info["wall_s"] = round(time.time() - t0, 1)
    info["config"] = {k: str(v) for k, v in vars(args).items()}
    save_pretrained(args.out, variables, args.backbone)
    print(json.dumps(info))
    if args.info_out:
        with open(args.info_out, "w") as f:
            json.dump(info, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
