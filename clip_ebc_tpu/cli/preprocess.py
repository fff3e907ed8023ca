"""Preprocessing CLI (reference preprocess.py:431-458)."""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Preprocess raw crowd datasets.")
    p.add_argument(
        "--dataset", type=str, required=True,
        choices=["nwpu", "ucf_qnrf", "qnrf", "jhu", "shanghaitech_a", "shanghaitech_b", "sha", "shb"],
    )
    p.add_argument("--src_dir", type=str, required=True)
    p.add_argument("--dst_dir", type=str, required=True)
    p.add_argument("--min_size", type=int, default=256)
    p.add_argument("--max_size", type=int, default=None)
    p.add_argument("--generate_npy", action="store_true")
    args = p.parse_args(argv)

    from ..data.preprocess import preprocess

    preprocess(
        dataset=args.dataset,
        src_dir=os.path.abspath(args.src_dir),
        dst_dir=os.path.abspath(args.dst_dir),
        min_size=args.min_size,
        max_size=float("inf") if args.max_size is None else args.max_size,
        generate_npy=args.generate_npy,
    )


if __name__ == "__main__":
    main()
