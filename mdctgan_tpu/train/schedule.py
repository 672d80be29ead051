"""Learning-rate schedule (reference pix2pixHD_model.py:664-673).

The reference holds lr constant for ``niter`` epochs then subtracts
``lr0/niter_decay`` after each following epoch.  Expressed here as a pure
optax schedule over the step count (epoch = step // steps_per_epoch), so the
decay state lives inside the optimizer count — checkpointable, no host-side
mutation, no recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def pix2pixhd_lr_schedule(
    lr0: float, niter: int, niter_decay: int, steps_per_epoch: int
) -> optax.Schedule:
    def schedule(count):
        epoch0 = count // max(steps_per_epoch, 1)  # 0-indexed epoch
        past = jnp.maximum(epoch0 - niter, 0)
        frac = 1.0 - past / max(niter_decay, 1)
        return lr0 * jnp.clip(frac, 0.0, 1.0)

    return schedule


def make_optimizers(
    lr: float,
    beta1: float,
    niter: int,
    niter_decay: int,
    steps_per_epoch: int,
    accum_steps: int = 1,
):
    """The reference's two Adam optimizers (pix2pixHD_model.py:344-364):
    Adam(lr, betas=(beta1, 0.999)) for G and D, with the epoch-linear decay.

    ``accum_steps > 1`` (no reference equivalent — a TPU-native addition for
    HBM-bound large effective batches) wraps both in ``optax.MultiSteps``:
    gradients average over k micro-batches and Adam applies every k-th step.
    The decay schedule then counts EFFECTIVE updates, so epoch boundaries
    stay aligned."""
    accum = max(int(accum_steps), 1)
    eff_steps_per_epoch = max(steps_per_epoch // accum, 1)
    sched = pix2pixhd_lr_schedule(lr, niter, niter_decay, eff_steps_per_epoch)
    g_tx = optax.adam(sched, b1=beta1, b2=0.999)
    d_tx = optax.adam(sched, b1=beta1, b2=0.999)
    if accum > 1:
        g_tx = optax.MultiSteps(g_tx, every_k_schedule=accum)
        d_tx = optax.MultiSteps(d_tx, every_k_schedule=accum)
    return g_tx, d_tx


def carry_schedule_count(old_opt_state, new_opt_state):
    """Transplant the LR-schedule position across an optimizer re-init.

    The reference's ``update_fixed_params`` builds a fresh Adam, but its
    epoch-linear decay keeps counting epochs from the start of training
    (train.py:257-262 calls update_fixed_params and then
    pix2pixHD_model.py:664-673 update_learning_rate on the SAME epoch
    counter).  Here the decay lives in the optax ``ScaleByScheduleState``
    count, so a bare ``tx.init`` would restart the schedule at 0 and delay
    the decay by however many epochs had already run.  Copy the old count
    into every ScaleByScheduleState of the fresh state; Adam moments and
    bias-correction stay fresh, matching the reference's new Adam.
    """

    def is_sched(x):
        return isinstance(x, optax.ScaleByScheduleState)

    counts = [
        s.count
        for s in jax.tree.leaves(old_opt_state, is_leaf=is_sched)
        if is_sched(s)
    ]
    if not counts:
        return new_opt_state
    return jax.tree.map(
        lambda s: s._replace(count=counts[0]) if is_sched(s) else s,
        new_opt_state,
        is_leaf=is_sched,
    )


class FreqClock:
    """Sample-counted trigger cadence for print/display/save/eval.

    The reference counts ``total_steps`` in SAMPLES, not optimizer steps
    (train.py:154-155 ``total_steps += opt.batchSize``), snaps ``print_freq``
    to ``lcm(print_freq, batchSize)`` (train.py:74), and phases every trigger
    by the resume offset (train.py:81-85 ``delta = total_steps % freq``) so a
    resumed run keeps the original cadence.  So ``train.sh``'s
    ``--save_latest_freq 16000`` at batch 20 means "save every 800 batches".

    ``tick()`` advances one batch and returns which triggers fire, matching
    the reference's post-increment comparisons (train.py:158,206,221,227).
    """

    def __init__(
        self,
        batch_size: int,
        start_samples: int,
        print_freq: int,
        display_freq: int,
        save_latest_freq: int,
        eval_freq: int,
        eval_enabled: bool,
    ):
        from math import lcm

        self.batch = batch_size
        self.print_freq = lcm(max(print_freq, 1), batch_size)
        self.display_freq = max(display_freq, 1)
        self.save_freq = max(save_latest_freq, 1)
        self.eval_freq = max(eval_freq, 1)
        self.total = start_samples
        self.print_delta = start_samples % self.print_freq
        self.display_delta = start_samples % self.display_freq
        self.save_delta = start_samples % self.save_freq
        # reference train.py:85: eval_delta = -1 unless validation_split > 0
        self.eval_delta = (
            start_samples % self.eval_freq if (eval_enabled and eval_freq > 0)
            else -1
        )

    def tick(self):
        self.total += self.batch
        return {
            "print": self.total % self.print_freq == self.print_delta,
            "display": self.total % self.display_freq == self.display_delta,
            "save": self.total % self.save_freq == self.save_delta,
            "eval": self.eval_delta >= 0
                    and self.total % self.eval_freq == self.eval_delta,
        }
