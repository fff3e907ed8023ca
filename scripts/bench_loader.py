"""Host input-pipeline throughput: can the loader feed the chip?

Measures TrainLoader crops/s for the two train-bench configs, in thread
mode and (``--procs N``) process-pool mode. Run with a stripped
PYTHONPATH so worker spawn does not drag the TPU plugin in:

    JAX_PLATFORMS=cpu PYTHONPATH= python scripts/bench_loader.py [--procs 8]

Context (STATUS r3): the aug pipeline is GIL-bound numpy, so thread count
has no effect; this dev VM has ONE core (nproc=1), so neither do worker
processes HERE — the numbers below are per-core rates. Real TPU-VM hosts
(~112 vCPUs on v5e) scale with --procs: cores needed = chip crops/s /
per-core rate (vgg19_ae: 229.5 / ~9 = ~26 cores; flagship: 853.8 / ~72 =
~12 cores).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=0,
                    help="worker processes (0 = thread mode)")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--data_dir", type=str, default="/tmp/synth224")
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma-separated proc counts (e.g. 1,2,4,8,16): "
                    "measure each and emit a JSON scaling curve to "
                    "LOADER_SCALING.json — run this on a multi-core TPU-VM "
                    "host to validate the per-core extrapolation")
    args = ap.parse_args()

    if args.sweep:
        import json
        import subprocess

        curve = {"nproc_host": os.cpu_count(), "points": []}
        for p in [int(x) for x in args.sweep.split(",")]:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--procs", str(p), "--data_dir", args.data_dir],
                capture_output=True, text=True,
            )
            rates = {}
            for line in (out.stdout or "").splitlines():
                if "crops/s host-side" in line:
                    parts = line.split()
                    rates[parts[0]] = float(parts[-3])
            curve["points"].append({"procs": p, "rates": rates,
                                    "rc": out.returncode})
            print(f"procs={p}: {rates}")
        with open("LOADER_SCALING.json", "w") as f:
            json.dump(curve, f, indent=2)
        print("wrote LOADER_SCALING.json")
        return

    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data import make_train_transforms
    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.loader import TrainLoader
    from clip_ebc_tpu.data.synthetic import make_synthetic_crowd_dataset

    if not os.path.isdir(os.path.join(args.data_dir, "shb")):
        make_synthetic_crowd_dataset(
            args.data_dir, n_train=192, n_val=24, size=(512, 768),
            max_count=300, seed=7,
        )

    for model, input_size, batch in (
        ("vgg19_ae", 448, 16),
        ("clip_vit_b_16", 224, 32),
    ):
        cfg = ExperimentConfig(
            dataset="shb", model=model, input_size=input_size, reduction=8,
            truncation=4, batch_size=batch, num_crops=1,
            data_root=args.data_dir,
        ).normalize()
        ds = CrowdDataset(
            "shb", "train", data_root=args.data_dir, num_crops=1,
            transforms=make_train_transforms(cfg), check_sizes=False,
        )
        loader = TrainLoader(
            ds, batch_size=batch, reduction=8, seed=0,
            num_threads=args.threads, num_workers=args.procs,
        )
        loader.set_epoch(1)
        for _ in loader:  # warm epoch (pool spawn, page cache)
            pass
        loader.set_epoch(2)
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            n += b.images.shape[0]
        dt = time.perf_counter() - t0
        mode = f"procs{args.procs}" if args.procs else f"threads{args.threads}"
        print(f"{model} {input_size}^2 batch{batch} {mode}: "
              f"{n/dt:7.1f} crops/s host-side")
        loader.close()


if __name__ == "__main__":
    main()
