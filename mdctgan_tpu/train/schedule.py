"""Learning-rate schedule (reference pix2pixHD_model.py:664-673).

The reference holds lr constant for ``niter`` epochs then subtracts
``lr0/niter_decay`` after each following epoch.  Expressed here as a pure
optax schedule over the step count (epoch = step // steps_per_epoch), so the
decay state lives inside the optimizer count — checkpointable, no host-side
mutation, no recompiles.
"""

from __future__ import annotations

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
):
    """The reference's two Adam optimizers (pix2pixHD_model.py:344-364):
    Adam(lr, betas=(beta1, 0.999)) for G and D, with the epoch-linear decay."""
    sched = pix2pixhd_lr_schedule(lr, niter, niter_decay, steps_per_epoch)
    g_tx = optax.adam(sched, b1=beta1, b2=0.999)
    d_tx = optax.adam(sched, b1=beta1, b2=0.999)
    return g_tx, d_tx
