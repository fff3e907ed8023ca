"""Logging: python logger + scalar metric writer.

The reference logs to ``train.log`` + console and writes tensorboardX
scalars (reference utils/log_utils.py:10-34). We log scalars as TSV and,
when TensorBoard (via tensorboardX or torch.utils.tensorboard) is
importable, mirror them there.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional


def get_logger(log_file: Optional[str] = None, name: str = "clip_ebc_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False  # root logger often has absl/jax handlers
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricWriter:
    """Append-only scalar log: one ``step\ttag\tvalue`` line per scalar.

    Optionally mirrors to TensorBoard if a SummaryWriter implementation is
    available (gated import: tensorboardX is not guaranteed in this image).
    """

    def __init__(self, log_dir: str) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "scalars.tsv")
        self._file = open(self._path, "a")
        self._tb = None
        for mod, cls in (
            ("torch.utils.tensorboard", "SummaryWriter"),
            ("tensorboardX", "SummaryWriter"),
        ):
            try:
                import importlib

                self._tb = getattr(importlib.import_module(mod), cls)(log_dir)
                break
            except Exception:
                continue

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        for tag, value in scalars.items():
            self._file.write(f"{step}\t{tag}\t{float(value):.8g}\n")
            if self._tb is not None:
                self._tb.add_scalar(tag, float(value), step)
        self._file.flush()

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
