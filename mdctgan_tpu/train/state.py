"""Train state: one pytree holding both networks and both optimizers.

The reference keeps two torch modules + two Adam optimizers and checkpoints
only the module weights (base_model.py:43-46; optimizer state is lost on
resume — SURVEY.md §5.4).  Here the entire state — G/D params, G batch stats,
both optax states, step — is a single pytree, so orbax checkpoints capture
everything and resume is exact.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class GANTrainState:
    step: jax.Array
    g_params: Any
    d_params: Any
    batch_stats: Any  # BatchNorm running stats (attention stacks only)
    g_opt_state: Any
    d_opt_state: Any

    def params_count(self) -> int:
        return sum(int(x.size) for x in jax.tree.leaves(self.g_params))


def create_train_state(
    rng: jax.Array,
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    spectro_shape,
    g_in_channels: int,
    d_in_channels: int,
) -> GANTrainState:
    """Initialize both networks with dummy spectrogram-shaped inputs.

    ``spectro_shape`` is (H, W) of the spectrogram image (bins, n_fft//2).
    """
    g_rng, d_rng = jax.random.split(rng)
    h, w = spectro_shape
    g_vars = generator.init(
        g_rng, jnp.zeros((1, h, w, g_in_channels)), train=False
    )
    d_vars = discriminator.init(d_rng, jnp.zeros((1, h, w, d_in_channels)))
    g_params = g_vars["params"]
    batch_stats = g_vars.get("batch_stats", {})
    d_params = d_vars["params"]
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        batch_stats=batch_stats,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
    )
