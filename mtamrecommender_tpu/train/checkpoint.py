"""Checkpoint / resume with the reference's three load modes.

Replaces tf.train.Saver (`/root/reference/Model/base_model.py:124-147`,
load modes at :48-69) with Orbax async-capable sharded checkpoints of
params + optimizer state + step:

  * from_scratch — ignore any checkpoint
  * full         — restore the latest checkpoint from the run's dir
  * fine_tune    — restore params only (fresh optimizer state) from
                   `fine_tune_load_path`, the var-list-restore analogue
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from mtamrecommender_tpu.config import TrainConfig
from mtamrecommender_tpu.train.trainer import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, wait: bool = False) -> None:
        payload = {"params": state.params, "opt_state": state.opt_state}
        self.manager.save(state.step, args=ocp.args.StandardSave(payload))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct,
            {"params": template.params, "opt_state": template.opt_state})
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return TrainState(params=restored["params"],
                          opt_state=restored["opt_state"], step=int(step))

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def apply_load_type(cfg: TrainConfig, state: TrainState, run_ckpt_dir: str,
                    optimizer_init=None) -> TrainState:
    """Dispatch on load_type (base_model.init_variables:48-69)."""
    if cfg.load_type == "from_scratch":
        return state
    if cfg.load_type == "full":
        ckpt = Checkpointer(run_ckpt_dir)
        try:
            return ckpt.restore(state)
        finally:
            ckpt.close()
    if cfg.load_type == "fine_tune":
        if not cfg.fine_tune_load_path:
            raise ValueError("fine_tune requires fine_tune_load_path")
        ckpt = Checkpointer(cfg.fine_tune_load_path)
        try:
            restored = ckpt.restore(state)
        finally:
            ckpt.close()
        # params only; fresh optimizer state + step (var-list restore analogue)
        opt_state = (optimizer_init(restored.params)
                     if optimizer_init is not None else state.opt_state)
        return TrainState(params=restored.params, opt_state=opt_state, step=0)
    raise ValueError(f"unknown load_type {cfg.load_type!r}")
