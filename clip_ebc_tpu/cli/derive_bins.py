"""Derive count-bin tables from a preprocessed dataset.

The reference's bin/anchor JSONs were produced offline in notebooks from
block-count histograms (notebooks/counts/*/counts_{4..64}.json, see
reference README and SURVEY §5). This CLI reproduces that pipeline:

  python -m clip_ebc_tpu.cli.derive_bins --dataset shb --data_root data \
      --reduction 8 --truncations 2 4 11 --out bins_shb.json

For each truncation T it emits the "fine" binning
  [0,0], [1,1], ..., [T-1,T-1], [T, inf]
with anchor_points "middle" (bin midpoint / lower edge for the open bin)
and "average" (mean train-split block count within the bin — the value the
reference's anchors encode), plus the raw histogram for inspection.
"""

from __future__ import annotations

import argparse
import json
import math
from collections import Counter

import numpy as np


def block_count_histogram(dataset, reduction: int) -> Counter:
    """Histogram of integer per-block point counts over a dataset."""
    from ..data.density import rasterize_points, block_sum

    hist: Counter = Counter()
    for i in range(len(dataset)):
        images, labels, _ = dataset[i]
        h, w = images.shape[1:3]
        h -= h % reduction
        w -= w % reduction
        dots = rasterize_points(labels[0], h, w, accumulate=True)
        blocks = block_sum(dots[None], reduction)[0]
        vals, counts = np.unique(blocks.astype(np.int64), return_counts=True)
        for v, c in zip(vals.tolist(), counts.tolist()):
            hist[int(v)] += int(c)
    return hist


def bin_structure(truncation: int, granularity: str):
    """Bin edges for one granularity.

    Structures reverse-engineered from the reference tables (verified
    against configs/reduction_{16,32}.json):
      fine    — singletons [0,0]..[T-1,T-1], then [T, inf]
      dynamic — singletons up to ceil(T/2)-1, then pairs, open at the
                first uncovered value
      coarse  — [0,0], then pairs [1,2],[3,4].. while the pair fits
                under T, open at the first uncovered value
    """
    if granularity == "fine":
        return [[i, i] for i in range(truncation)] + [[truncation, "inf"]]
    if granularity == "dynamic":
        bins = [[i, i] for i in range(-(-truncation // 2))]
        nxt = len(bins)
        while nxt + 1 <= truncation - 1:
            bins.append([nxt, nxt + 1])
            nxt += 2
        bins.append([nxt, "inf"])
        return bins
    if granularity == "coarse":
        bins = [[0, 0]]
        nxt = 1
        while nxt + 1 <= truncation - 1:
            bins.append([nxt, nxt + 1])
            nxt += 2
        bins.append([nxt, "inf"])
        return bins
    raise ValueError(f"granularity must be fine|dynamic|coarse, got {granularity}")


def derive(hist: Counter, truncation: int, granularity: str = "fine"):
    """(bins, anchors{middle,average}) for one truncation/granularity."""
    bins = bin_structure(truncation, granularity)
    middle = [
        float(lo) if hi == "inf" else (lo + hi) / 2.0 for lo, hi in bins
    ]
    average = []
    for lo, hi in bins:
        hi_v = math.inf if hi == "inf" else hi
        total = sum(c for v, c in hist.items() if lo <= v <= hi_v)
        mass = sum(v * c for v, c in hist.items() if lo <= v <= hi_v)
        average.append(round(mass / total, 5) if total else float(lo))
    return bins, {"middle": middle, "average": average}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Derive bin/anchor tables from data.")
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--data_root", default="data")
    p.add_argument("--reduction", type=int, default=8)
    p.add_argument("--truncations", type=int, nargs="+", default=[4])
    p.add_argument("--granularities", type=str, nargs="+", default=["fine"],
                   choices=["fine", "dynamic", "coarse"])
    p.add_argument("--out", required=True)
    p.add_argument("--disable_size_check", action="store_true")
    args = p.parse_args(argv)

    from ..config import standardize_dataset_name
    from ..data import CrowdDataset

    ds_name = standardize_dataset_name(args.dataset)
    dataset = CrowdDataset(
        ds_name, args.split, data_root=args.data_root,
        check_sizes=not args.disable_size_check,
    )
    hist = block_count_histogram(dataset, args.reduction)

    table = {}
    for t in args.truncations:
        entry = {"bins": {}, "anchor_points": {}}
        for g in args.granularities:
            bins, anchors = derive(hist, t, g)
            entry["bins"][g] = bins
            entry["anchor_points"][g] = anchors
        table.setdefault(str(t), {})[ds_name] = entry
    out = {
        "reduction": args.reduction,
        "histogram": {str(k): v for k, v in sorted(hist.items())},
        "table": table,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out} (histogram over {sum(hist.values())} blocks)")


if __name__ == "__main__":
    main()
