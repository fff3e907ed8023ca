"""Visual-inspection tool (the reference ships notebooks for this:
notebooks/dataset.ipynb renders image+points+density overlays,
notebooks/model.ipynb renders predicted vs GT density maps).

Renders PNG panels instead of notebook cells:

  # dataset transforms sanity check
  python -m clip_ebc_tpu.cli.visualize dataset --dataset shb --data_root data \
      --out viz/ --num 4 [--augment]

  # model predictions vs ground truth
  python -m clip_ebc_tpu.cli.visualize model --dataset shb --data_root data \
      --model vgg19_ae --weight_path ckpt/best/12 --out viz/ --num 4
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _panel(ax, img, title):
    ax.imshow(np.clip(img, 0, 1))
    ax.set_title(title, fontsize=9)
    ax.axis("off")


def cmd_dataset(args) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..config import ExperimentConfig
    from ..data import CrowdDataset, denormalize_image, make_train_transforms
    from ..data.density import block_sum

    cfg = ExperimentConfig(
        dataset=args.dataset, input_size=args.input_size, reduction=args.reduction,
        truncation=None, regression=True, data_root=args.data_root,
    ).normalize()
    ds = CrowdDataset(
        args.dataset, args.split, data_root=args.data_root,
        transforms=make_train_transforms(cfg) if args.augment else None,
        check_sizes=False,
    )
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(min(args.num, len(ds))):
        images, labels, densities = ds.__getitem__(i, rng=rng)
        img = denormalize_image(images[0])
        pts = labels[0]
        blocks = block_sum(densities[0][None], args.reduction)[0]
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        _panel(axes[0], img, f"image #{i} ({img.shape[1]}x{img.shape[0]})")
        _panel(axes[1], img, f"{len(pts)} points")
        if len(pts):
            axes[1].scatter(pts[:, 0], pts[:, 1], s=6, c="red", marker="x")
        axes[2].imshow(blocks, cmap="jet")
        axes[2].set_title(f"block density (sum={blocks.sum():.0f})", fontsize=9)
        axes[2].axis("off")
        path = os.path.join(args.out, f"dataset_{i}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        print("wrote", path)


def cmd_model(args) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from ..config import get_bins_and_anchors
    from ..data import CrowdDataset, denormalize_image
    from ..models import get_model
    from ..training.checkpoint import CheckpointManager
    from ..training.evaluate import Evaluator

    bins = anchors = None
    if not args.regression:
        bins, anchors = get_bins_and_anchors(
            args.reduction, args.truncation, args.dataset
        )
    model = get_model(args.model, args.input_size, args.reduction, bins, anchors)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.input_size, args.input_size, 3)),
        train=False,
    )
    mgr = CheckpointManager(os.path.dirname(os.path.abspath(args.weight_path)) or ".")
    weights_t = {"params": template["params"]}
    if "batch_stats" in template:
        weights_t["batch_stats"] = template["batch_stats"]
    variables = mgr.restore_weights(os.path.abspath(args.weight_path), weights_t)

    ds = CrowdDataset(args.dataset, args.split, data_root=args.data_root, check_sizes=False)
    ev = Evaluator(model, reduction=args.reduction)
    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        images, labels, _ = ds[i]
        pred = np.asarray(ev.predict_density(variables, images[0]))
        img = denormalize_image(images[0])
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        _panel(axes[0], img, f"gt={len(labels[0])}")
        axes[1].imshow(pred, cmap="jet")
        axes[1].set_title(f"pred={pred.sum():.1f}", fontsize=9)
        axes[1].axis("off")
        path = os.path.join(args.out, f"model_{i}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        print("wrote", path)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Render dataset / prediction panels.")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dataset")
    d.add_argument("--dataset", required=True)
    d.add_argument("--split", default="train")
    d.add_argument("--data_root", default="data")
    d.add_argument("--input_size", type=int, default=448)
    d.add_argument("--reduction", type=int, default=8)
    d.add_argument("--augment", action="store_true")
    d.add_argument("--num", type=int, default=4)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--out", default="viz")
    d.set_defaults(fn=cmd_dataset)

    m = sub.add_parser("model")
    m.add_argument("--dataset", required=True)
    m.add_argument("--split", default="val")
    m.add_argument("--data_root", default="data")
    m.add_argument("--model", default="vgg19_ae")
    m.add_argument("--input_size", type=int, default=448)
    m.add_argument("--reduction", type=int, default=8)
    m.add_argument("--truncation", type=int, default=4)
    m.add_argument("--regression", action="store_true")
    m.add_argument("--weight_path", required=True)
    m.add_argument("--num", type=int, default=4)
    m.add_argument("--out", default="viz")
    m.set_defaults(fn=cmd_model)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
