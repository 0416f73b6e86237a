"""Checkpoint save/resume via Orbax, with restorable run metadata.

Mirrors the reference semantics: periodic ``model{step:09d}`` + optimizer
state saves (train_loop.py:205-225), resume by step (:84-106), and an
``args.json`` written next to the checkpoints whose values are restored at
generate time (parser_util.py:7-39 ``parse_and_load_from_model``;
train_RAG.py:26-28).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_args", "load_args"]


def save_args(save_dir: str, args: Dict[str, Any]) -> None:
    """Persist run hyperparameters for eval-time restoration
    (train_RAG.py:26-28)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        json.dump(args, f, indent=2, sort_keys=True, default=str)


def load_args(model_path_or_dir: str) -> Dict[str, Any]:
    """Load the args.json next to a checkpoint (parser_util.py:7-39)."""
    d = model_path_or_dir
    if not os.path.isdir(d):
        d = os.path.dirname(d)
    with open(os.path.join(d, "args.json")) as f:
        return json.load(f)


class CheckpointManager:
    """Thin orbax wrapper storing the full TrainState pytree per step."""

    def __init__(self, save_dir: str, max_to_keep: Optional[int] = None):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def close(self):
        self._mgr.close()


def params_to_flat_numpy(params) -> Dict[str, np.ndarray]:
    """Flatten a param tree to {'a/b/c': ndarray} (portable export)."""
    flat = {}

    def visit(path, leaf):
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        flat[key] = np.asarray(leaf)

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def save_params_npz(path: str, params) -> None:
    """Template-free portable params file (model weights only, mirroring the
    reference's plain state_dict saves, train_loop.py:205-217)."""
    np.savez(path, **params_to_flat_numpy(jax.device_get(params)))


def load_params_npz(path: str) -> Dict:
    """Rebuild the nested param dict from a flat npz."""
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
