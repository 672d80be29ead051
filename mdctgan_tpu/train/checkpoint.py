"""Checkpoint save/restore via orbax.

The reference stores bare ``state_dict``s per net per epoch and loses
optimizer state on resume (base_model.py:43-46, SURVEY.md §5.4).  Here one
orbax checkpoint captures the full ``GANTrainState`` (params, batch stats,
both Adam states, step), plus the iteration cursor the reference keeps in
``iter.txt`` (train.py:32-43).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple, Union

import jax
import orbax.checkpoint as ocp

from mdctgan_tpu.train.state import GANTrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # epoch -> orbax step, so --which_epoch N can select a non-latest
        # checkpoint (reference <epoch>_net_G.pth naming, base_model.py:50-53)
        self._index_path = os.path.join(self.directory, "epoch_index.json")
        self._epoch_index = self._load_index()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                # epoch-end checkpoints are exempt from max_to_keep pruning —
                # the reference keeps every <epoch>_net_G.pth forever
                should_keep_fn=lambda step: step in self._epoch_index.values(),
            ),
        )

    def _load_index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return {int(k): int(v) for k, v in json.load(f).items()}
        return {}

    def save(
        self,
        state: GANTrainState,
        epoch: int,
        epoch_iter: int = 0,
        epoch_label: Optional[int] = None,
    ) -> None:
        """``epoch_label`` marks this save as the end-of-epoch checkpoint for
        that epoch (the reference's ``model.save(epoch)``, train.py:249-254):
        it becomes addressable via --which_epoch and is kept forever.

        Saves are ASYNC: this enqueues the write and returns; training
        continues while orbax serializes in the background (through a
        tunneled TPU a blocking full-state save stalls the loop for tens of
        minutes — CLAUDE.md).  The one ordering constraint is here: a new
        save first drains the previous one.  Reads (restore/resolve/peek)
        drain too, so a restore-after-save always sees the finished file."""
        self._mgr.wait_until_finished()
        if epoch_label is not None:
            # in-memory first (should_keep_fn consults it at prune time) ...
            self._epoch_index[int(epoch_label)] = int(state.step)
        payload = {
            "state": state,
            # "units" versions the cursor: epoch_iter counts SAMPLES
            # (reference iter.txt semantics); older checkpoints without the
            # field counted batches and are converted on restore
            "cursor": {"epoch": epoch, "epoch_iter": epoch_iter,
                       "units_samples": 1},
        }
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
        if epoch_label is not None and jax.process_index() == 0:
            # ... but persist the index only after the save is enqueued, so
            # a crash before the save leaves no phantom epoch entry pointing
            # at a step that never landed (one writer under multihost)
            with open(self._index_path, "w") as f:
                json.dump(self._epoch_index, f)

    def resolve_epoch(self, which_epoch: Union[str, int]) -> Optional[int]:
        """--which_epoch -> orbax step: 'latest' -> newest save; an integer
        -> the end-of-epoch checkpoint recorded in epoch_index.json."""
        self._mgr.wait_until_finished()  # an in-flight save may be "latest"
        if which_epoch in (None, "latest"):
            return self._mgr.latest_step()
        try:
            epoch = int(which_epoch)
        except ValueError:
            raise FileNotFoundError(
                f"--which_epoch {which_epoch!r} is neither 'latest' nor an "
                f"epoch number (available: {sorted(self._epoch_index)})"
            )
        if epoch not in self._epoch_index:
            raise FileNotFoundError(
                f"no checkpoint recorded for epoch {epoch} under "
                f"{self.directory} (available epochs: "
                f"{sorted(self._epoch_index)})"
            )
        step = self._epoch_index[epoch]
        if step not in self._mgr.all_steps():
            # a stale index entry (e.g. the epoch-end save was interrupted
            # after an older index write) must fail cleanly, not as a raw
            # orbax error for a nonexistent step directory
            raise FileNotFoundError(
                f"epoch_index.json maps epoch {epoch} to step {step}, but "
                f"that checkpoint does not exist under {self.directory} "
                f"(available steps: {sorted(self._mgr.all_steps())})"
            )
        return step

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
        self._mgr.wait_until_finished()  # drain an in-flight async save
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        out = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item={"state": fields}, partial_restore=True
            ),
        )
        # partial_restore fills the INTERSECTION of template and checkpoint;
        # a template leaf absent from the checkpoint comes back untouched —
        # for the abstract (eval_shape) templates inference uses, that is a
        # raw ShapeDtypeStruct that would crash much later inside jit with an
        # opaque "not a valid JAX type".  Fail HERE with the param names: the
        # only way this happens is a model built with different architecture
        # flags than the training run.
        missing = [
            jax.tree_util.keystr(path)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                out["state"]
            )
            if isinstance(leaf, jax.ShapeDtypeStruct)
        ]
        if missing:
            shown = ", ".join(missing[:6])
            more = f" (+{len(missing) - 6} more)" if len(missing) > 6 else ""
            raise ValueError(
                f"checkpoint {self.directory} step {step} holds no value for "
                f"{len(missing)} requested parameter(s): {shown}{more} — the "
                f"constructed model's architecture does not match the one "
                f"that wrote this checkpoint (compare --netG/--ngf/"
                f"--downsample_type/--upsample_type/--n_blocks_* against the "
                f"training run's opt.txt)"
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
        self._mgr.wait_until_finished()  # drain an in-flight async save
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
        self,
        template: GANTrainState,
        step: Optional[int] = None,
        batch_size: int = 1,
    ) -> Tuple[GANTrainState, int, int]:
        """Restore (state, epoch, epoch_iter-in-samples); raises if no
        checkpoint.  ``batch_size`` converts legacy cursors (pre-"units"
        checkpoints counted epoch_iter in batches)."""
        self._mgr.wait_until_finished()  # drain an in-flight async save
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        target = {
            "state": template,
            "cursor": {"epoch": 0, "epoch_iter": 0, "units_samples": 0},
        }
        try:
            out = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
            cur = out["cursor"]
            it = int(cur["epoch_iter"])
        except Exception as primary:
            # legacy cursor without "units_samples": epoch_iter counted BATCHES
            target["cursor"] = {"epoch": 0, "epoch_iter": 0}
            try:
                out = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(target)
                )
            except Exception:
                raise primary  # not a cursor-format issue — surface the real error
            cur = out["cursor"]
            it = int(cur["epoch_iter"]) * max(int(batch_size), 1)
        return out["state"], int(cur["epoch"]), it

    def close(self) -> None:
        self._mgr.wait_until_finished()  # in-flight async save must land
        self._mgr.close()
