"""Checkpoint save/restore via orbax.

The reference stores bare ``state_dict``s per net per epoch and loses
optimizer state on resume (base_model.py:43-46, SURVEY.md §5.4).  Here one
orbax checkpoint captures the full ``GANTrainState`` (params, batch stats,
both Adam states, step), plus the iteration cursor the reference keeps in
``iter.txt`` (train.py:32-43).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import orbax.checkpoint as ocp

from mdctgan_tpu.train.state import GANTrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: GANTrainState, epoch: int, epoch_iter: int = 0) -> None:
        payload = {
            "state": state,
            "cursor": {"epoch": epoch, "epoch_iter": epoch_iter},
        }
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_fields(self, fields: dict, step: Optional[int] = None) -> dict:
        """Partial restore of selected ``GANTrainState`` fields (e.g.
        ``{"g_params": tmpl, "batch_stats": tmpl}``).

        Inference/export only needs weights; a FULL-state template would
        have to reproduce the exact optax optimizer-state STRUCTURE the
        training run used (which depends on --freeze_*/--niter_fix_global
        masking) — a structure mismatch makes orbax refuse the restore.
        Restoring just the requested subtrees sidesteps that entirely."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        out = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item={"state": fields}, partial_restore=True
            ),
        )
        return out["state"]

    def peek_cursor(
        self, step: Optional[int] = None
    ) -> Optional[Tuple[int, int]]:
        """(epoch, epoch_iter) of a checkpoint WITHOUT restoring the state.

        The full-state restore template depends on the optimizer masking in
        effect when the checkpoint was written (--niter_fix_global unfreezes
        mid-run), which itself depends on the saved epoch — so the cursor
        must be readable first.  Returns None when no checkpoint exists.

        Uses a throwaway manager: orbax pins an item's handler to the FIRST
        args class used on a manager instance, and mixing this PyTreeRestore
        with the later StandardRestore on ``self._mgr`` would conflict."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        peek_mgr = ocp.CheckpointManager(self.directory)
        try:
            out = peek_mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item={"cursor": {"epoch": 0, "epoch_iter": 0}},
                    partial_restore=True,
                ),
            )
        finally:
            peek_mgr.close()
        cur = out["cursor"]
        return int(cur["epoch"]), int(cur["epoch_iter"])

    def restore(
        self, template: GANTrainState, step: Optional[int] = None
    ) -> Tuple[GANTrainState, int, int]:
        """Restore (state, epoch, epoch_iter); raises if no checkpoint."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        target = {
            "state": template,
            "cursor": {"epoch": 0, "epoch_iter": 0},
        }
        out = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        cur = out["cursor"]
        return out["state"], int(cur["epoch"]), int(cur["epoch_iter"])

    def close(self) -> None:
        self._mgr.close()
