"""Checkpointing: rolling full-state checkpoint + best-k weight snapshots.

Reference semantics (reference utils/train_utils.py:103-157,
utils/log_utils.py:71-107): a single rolling checkpoint with model/
optimizer/schedule state, epoch, loss history and best scores, auto-
resumed at startup; plus weights-only "best_{metric}_{rank}" snapshots
for the k best validation scores per metric.

TPU-native storage is Orbax (async-capable, sharding-aware). Instead of
the reference's rank-shifting file renames, best weights are stored once
per epoch under ``best/{epoch}`` and a JSON table maps each metric to its
ranked (score, epoch) list; snapshots no longer referenced by any top-k
list are pruned.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

METRICS = ("mae", "rmse")


class CheckpointManager:
    def __init__(self, ckpt_dir: str, save_best_k: int = 3) -> None:
        self.dir = os.path.abspath(ckpt_dir)
        self.save_best_k = save_best_k
        # Multi-host: orbax saves are collective (every process must call
        # them on its shards); surrounding file surgery (swaps, prunes,
        # meta.json) is primary-only, fenced by device barriers. The
        # reference's analog is rank-0 gating + dist.barrier
        # (reference trainer.py:181-194, utils/log_utils.py:100-105).
        self._primary = jax.process_index() == 0
        if self._primary:
            os.makedirs(self.dir, exist_ok=True)
        self._sync("ckpt_dir_ready")
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.dir, "meta.json")

    def _sync(self, tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"clip_ebc_{tag}")

    # -- meta ---------------------------------------------------------------

    def _load_meta(self) -> Dict[str, Any]:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {
            "epoch": 0,
            "hist_scores": {m: [] for m in METRICS},
            "best_scores": {m: [] for m in METRICS},  # ranked [score, epoch]
            "loss_history": [],
        }

    def _save_meta(self, meta: Dict[str, Any]) -> None:
        if not self._primary:
            return
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    # -- rolling full state ---------------------------------------------------

    def save_latest(self, state, epoch: int, loss_info: Optional[Dict[str, float]] = None) -> None:
        path = os.path.join(self.dir, "latest_new")
        if self._primary and os.path.exists(path):
            shutil.rmtree(path)
        self._sync("latest_pre_save")
        self._ckptr.save(path, _savable(state))
        self._ckptr.wait_until_finished()
        self._sync("latest_saved")
        if self._primary:
            final = os.path.join(self.dir, "latest")
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(path, final)
            meta = self._load_meta()
            meta["epoch"] = epoch
            if loss_info:
                meta["loss_history"].append(
                    {"epoch": epoch, **{k: float(v) for k, v in loss_info.items()}}
                )
            self._save_meta(meta)
        self._sync("latest_done")

    def restore_latest(self, state_template) -> Optional[Tuple[Any, int]]:
        """Auto-resume: returns (state, next_epoch) or None if absent."""
        path = os.path.join(self.dir, "latest")
        if not os.path.exists(path):
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, _savable(state_template))
        restored = self._ckptr.restore(path, abstract)
        state = state_template.replace(**restored)
        meta = self._load_meta()
        return state, int(meta["epoch"]) + 1

    # -- best-k weight snapshots ----------------------------------------------

    def update_best(
        self, scores: Dict[str, float], epoch: int, weights
    ) -> Dict[str, List[Tuple[float, int]]]:
        """Insert this epoch's val scores; persist weights if it enters any
        top-k; prune snapshots that fell out everywhere. Returns the ranked
        best tables."""
        meta = self._load_meta()
        for m in METRICS:
            if m in scores:
                # A re-run epoch (crash between eval and checkpoint save)
                # supersedes its previous score instead of duplicating it.
                meta["hist_scores"][m] = [
                    x for x in meta["hist_scores"][m] if x[1] != epoch
                ]
                meta["hist_scores"][m].append([float(scores[m]), epoch])

        entered = False
        for m in METRICS:
            if m not in scores:
                continue
            table = [tuple(x) for x in meta["best_scores"][m] if x[1] != epoch]
            table.append((float(scores[m]), epoch))
            table.sort(key=lambda se: (se[0], se[1]))
            table = table[: self.save_best_k]
            if any(e == epoch for _, e in table):
                entered = True
            meta["best_scores"][m] = [list(x) for x in table]

        if entered:
            path = os.path.join(self.dir, "best", str(epoch))
            if self._primary and os.path.exists(path):
                shutil.rmtree(path)
            self._sync("best_pre_save")
            self._ckptr.save(path, weights)
            self._ckptr.wait_until_finished()
            self._sync("best_saved")

        if self._primary:
            keep = {
                e for m in METRICS for _, e in (tuple(x) for x in meta["best_scores"][m])
            }
            best_root = os.path.join(self.dir, "best")
            if os.path.isdir(best_root):
                for name in os.listdir(best_root):
                    if name.isdigit() and int(name) not in keep:
                        shutil.rmtree(os.path.join(best_root, name))

        self._save_meta(meta)
        return {m: [tuple(x) for x in meta["best_scores"][m]] for m in METRICS}

    def best_weights_path(self, metric: str = "mae", rank: int = 0) -> Optional[str]:
        meta = self._load_meta()
        table = meta["best_scores"].get(metric, [])
        if rank >= len(table):
            return None
        return os.path.join(self.dir, "best", str(int(table[rank][1])))

    def restore_weights(self, path: str, weights_template):
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, weights_template)
        return self._ckptr.restore(path, abstract)

    def restore_weights_from_state(self, path: str, weights_template):
        """Restore only params/batch_stats out of a full train-state
        checkpoint (``latest/``). Template-free on the optimizer side — the
        caller (e.g. the NWPU driver, reference test_nwpu.py:55-68) doesn't
        know the optimizer tree. Shapes are checked against the template."""
        raw = self._ckptr.restore(path)  # serialized nested dict
        out = {}
        for key, template in weights_template.items():
            if key not in raw:
                raise KeyError(f"checkpoint at {path} has no {key!r} tree")
            restored = raw[key]

            def check(t, r, _key=key):
                if getattr(t, "shape", None) != getattr(r, "shape", None):
                    raise ValueError(
                        f"shape mismatch in {_key}: template "
                        f"{getattr(t, 'shape', None)} vs checkpoint "
                        f"{getattr(r, 'shape', None)}"
                    )
                return r

            out[key] = jax.tree_util.tree_map(check, template, restored)
        return out

    @property
    def meta(self) -> Dict[str, Any]:
        return self._load_meta()


def _savable(state) -> Dict[str, Any]:
    """The array-bearing fields of a TrainState (tx is static code)."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
