"""Checkpoint / resume with the reference's three load modes.

Replaces tf.train.Saver (`/root/reference/Model/base_model.py:124-147`,
load modes at :48-69) with Orbax async-capable sharded checkpoints of
params + optimizer state + step + data cursor:

  * from_scratch — ignore any checkpoint
  * full         — restore the latest checkpoint from the run's dir
  * fine_tune    — restore params only (fresh optimizer state) from
                   `fine_tune_load_path`, the var-list-restore analogue

The **data cursor** (a TPU-build addition — the reference restores
weights only and restarts its epoch loop) records the epoch, the global
step at that epoch's start, and both rng states as of the epoch start;
`Trainer.resume_from_cursor` + `fit(start_epoch, skip_steps)` replay the
interrupted epoch's shuffle and fast-forward past the already-trained
steps, making resume EXACTLY trajectory-preserving (pinned by
tests/test_train.py::test_resume_trajectory_exact).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from mtamrecommender_tpu.config import TrainConfig
from mtamrecommender_tpu.train.trainer import TrainState

Cursor = Dict[str, Any]   # JSON-able: epoch, step_at_epoch_start, rng states


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, cursor: Optional[Cursor] = None,
             wait: bool = False) -> None:
        payload = {"params": state.params, "opt_state": state.opt_state}
        items = {"state": ocp.args.StandardSave(payload)}
        if cursor is not None:
            items["cursor"] = ocp.args.JsonSave(cursor)
        self.manager.save(state.step, args=ocp.args.Composite(**items))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def _item_names(self, step: int):
        try:
            return set(self.manager.item_metadata(step).keys())
        except Exception:
            return None

    def _has_cursor(self, step: int) -> bool:
        names = self._item_names(step)
        return names is not None and "cursor" in names

    def restore(self, template: TrainState, step: Optional[int] = None,
                with_cursor: bool = False):
        """Restore TrainState (and, with ``with_cursor=True``, the data
        cursor as a second return value — None if the checkpoint predates
        cursors)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct,
            {"params": template.params, "opt_state": template.opt_state})
        names = self._item_names(step)
        if names is None or "state" not in names:
            # legacy layout: written by the pre-Composite code as a plain
            # StandardSave (Orbax stores it as the single unnamed 'default'
            # item, for which item_metadata returns None), so requesting
            # the Composite 'state' item raises ValueError — restore
            # top-level instead (ADVICE.md r1; no cursor in that era)
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(abstract))
            state = TrainState(params=restored["params"],
                               opt_state=restored["opt_state"], step=int(step))
            return (state, None) if with_cursor else state
        items = {"state": ocp.args.StandardRestore(abstract)}
        want_cursor = with_cursor and self._has_cursor(step)
        if want_cursor:
            items["cursor"] = ocp.args.JsonRestore()
        restored = self.manager.restore(step, args=ocp.args.Composite(**items))
        state = TrainState(params=restored["state"]["params"],
                           opt_state=restored["state"]["opt_state"],
                           step=int(step))
        if with_cursor:
            return state, (restored["cursor"] if want_cursor else None)
        return state

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()


def apply_load_type(cfg: TrainConfig, state: TrainState, run_ckpt_dir: str,
                    optimizer_init=None, with_cursor: bool = False):
    """Dispatch on load_type (base_model.init_variables:48-69).

    With ``with_cursor=True`` returns ``(state, cursor_or_None)`` so the
    caller can resume the data stream exactly (load_type='full' only —
    fine_tune starts a fresh run by definition).
    """
    if cfg.load_type == "from_scratch":
        return (state, None) if with_cursor else state
    if cfg.load_type == "full":
        ckpt = Checkpointer(run_ckpt_dir)
        try:
            return ckpt.restore(state, with_cursor=with_cursor)
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
        out = TrainState(params=restored.params, opt_state=opt_state, step=0)
        return (out, None) if with_cursor else out
    raise ValueError(f"unknown load_type {cfg.load_type!r}")
