"""Param and train-state persistence via Orbax (TPU-native checkpointing).

Replaces the reference's flax-msgpack save + params-only restore
(main.py:299-357, modeling_clip_vision_utils.py:398-451) with:
- `save_params` / `load_params`: a model directory holding config.json + an
  Orbax param tree (async-capable, sharding-aware on restore),
- `TrainCheckpointManager`: FULL train-state checkpoints — params, optimizer
  state, step, RNG key, and data-iterator position — with rotation. The
  reference's resume was params-only/dead code (SURVEY.md §3.4); here resume
  restores everything.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

PARAMS_DIR = "params"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_params(directory: str, params: Any) -> None:
    path = os.path.join(_abs(directory), PARAMS_DIR)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(directory: str, template: Optional[Any] = None) -> Any:
    """Restore params; with `template` (a pytree of jax.ShapeDtypeStruct or
    arrays, optionally carrying shardings) restores directly onto devices."""
    path = os.path.join(_abs(directory), PARAMS_DIR)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


class TrainCheckpointManager:
    """Step-indexed full-state checkpoints with rotation and resume.

    Layout: <output_dir>/checkpoints/<step>/{state, meta.json}
    `state` holds {params, opt_state, step, rng}; meta.json holds the data
    position (epoch, batches consumed) so the input pipeline can skip ahead.
    """

    def __init__(self, output_dir: str, max_to_keep: Optional[int] = 6):
        self.directory = os.path.join(_abs(output_dir), "checkpoints")
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any, data_meta: Optional[dict] = None) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if data_meta is not None:
            self.manager.wait_until_finished()
            step_dir = os.path.join(self.directory, str(step))
            if os.path.isdir(step_dir):
                with open(os.path.join(step_dir, "meta.json"), "w") as f:
                    json.dump(data_meta, f)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    @classmethod
    def open(cls, path: str) -> tuple["TrainCheckpointManager", Optional[int]]:
        """Open an existing checkpoint tree for restore, accepting any of:
        a run's output_dir (containing ``checkpoints/``), the ``checkpoints``
        dir itself, or a specific ``checkpoints/<step>`` dir. Returns
        (manager, step) where step is pinned only for the last form."""
        path = _abs(path)
        base = os.path.basename(path)
        step: Optional[int] = None
        if base.isdigit() and os.path.basename(os.path.dirname(path)) == "checkpoints":
            step = int(base)
            path = os.path.dirname(path)
        if os.path.basename(path) == "checkpoints":
            path = os.path.dirname(path)
        if not os.path.isdir(os.path.join(path, "checkpoints")):
            raise FileNotFoundError(f"no checkpoints/ directory under {path}")
        # rotation must never delete from a tree we're only reading
        return cls(path, max_to_keep=None), step

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        state = self.manager.restore(step, args=ocp.args.StandardRestore(target))
        meta_path = os.path.join(self.directory, str(step), "meta.json")
        meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def host_pytree(tree: Any) -> Any:
    """Device -> host numpy copy of a pytree (for metrics/serialization)."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
