"""Core package must import and build models without optional dependencies
(torch / cv2 / scipy / matplotlib / tensorboardX / tqdm are all gated)."""

import os
import subprocess
import sys

SCRIPT = r"""
import sys, builtins
real_import = builtins.__import__
BLOCKED = {"torch", "cv2", "scipy", "matplotlib", "tensorboardX", "tqdm"}
def guarded(name, *a, **k):
    if name.split(".")[0] in BLOCKED:
        raise ImportError("blocked: " + name)
    return real_import(name, *a, **k)
builtins.__import__ = guarded

import clip_ebc_tpu
from clip_ebc_tpu.models import get_model
from clip_ebc_tpu.losses import make_loss_fn
from clip_ebc_tpu.data import CrowdDataset, TrainLoader
from clip_ebc_tpu.training import Trainer
from clip_ebc_tpu.cli import trainer
get_model("vgg11", 32, 16, [(0.0, 0.0), (1.0, float("inf"))], [0.0, 1.5])
print("DEPS_OK")
"""


def test_core_has_no_hard_optional_deps():
    env = dict(os.environ)
    env["CLIP_EBC_TEST_REEXEC"] = "1"  # keep conftest from re-execing pytest
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "DEPS_OK" in out.stdout, out.stderr[-2000:]
