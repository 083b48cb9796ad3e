"""Self-describing run-dir checkpoints (orbax).

Contract parity with the reference (train.py:66-90,153-155; SURVEY.md
section 5): every run dir persists its full config as
``model_parameters.yml``; ``last`` holds {params, batch_stats, opt_state,
EMA shadow, step}; best models are checkpointed along two axes (val loss and
val inference metric), each in raw and EMA flavors.  Downstream tools
reconstruct models purely from yml + checkpoint.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml

from .steps import TrainState


def save_config(run_dir: str, **configs) -> None:
    os.makedirs(run_dir, exist_ok=True)
    out = {}
    for key, cfg in configs.items():
        out[key] = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else cfg
    with open(os.path.join(run_dir, "model_parameters.yml"), "w") as f:
        yaml.safe_dump(out, f)


def load_config(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "model_parameters.yml")) as f:
        return yaml.safe_load(f)


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.run_dir, f"ckpt_{tag}")

    def save(self, tag: str, state: TrainState) -> None:
        path = self._path(tag)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, tag: str, template: TrainState) -> TrainState:
        return self._ckpt.restore(self._path(tag), target=template)

    def restore_raw(self, tag: str) -> dict:
        """Restore without a template (raw pytree dict) -- lets downstream
        tools read {params, batch_stats, ema} without knowing the optimizer
        the run was trained with (the opt_state structure differs by tx).

        Leaves come back as host numpy arrays: orbax would otherwise replay
        the SAVED sharding, which fails when restoring on a different
        platform (e.g. a TPU-trained run dir opened by the CPU-pinned
        checkpoint conversion CLIs)."""
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(self._path(tag)).item_metadata
            args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
            )
            return ckptr.restore(self._path(tag), restore_args=args)

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))

    def copy(self, src_tag: str, dst_tag: str) -> bool:
        """On-disk checkpoint copy (the reference's periodic
        shutil.copyfile of best_model*.pt, train_ar.py:261-263) — no
        in-memory state retained between epochs.  Returns False when the
        source tag was never saved."""
        import shutil

        src, dst = self._path(src_tag), self._path(dst_tag)
        if not os.path.exists(src):
            return False
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        return True
