"""Fake-sample replay pool (reference util/image_pool.py:4-31).

The reference's pool mutates inside the forward pass (query = maybe-swap each
sample with a random stored one).  That host-side control flow can't live in a
jitted TPU step, so the pool is split into two host-side halves around the
fused step:

  * ``presample(B)`` — draw the swap decisions and the old samples BEFORE the
    step (they depend only on pool contents + RNG, never on the new fakes);
    returns ``(old_batch, use_old_mask)`` as fixed-shape arrays the step mixes
    with ``jnp.where``.
  * ``commit(fakes)`` — AFTER the step, append/replace with the freshly
    generated fakes, completing the reference's query() side effects.

With ``pool_size == 0`` (the shipped default, train_options.py:45) the pool is
inert and the step uses the current fakes directly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = int(pool_size)
        self.images: List[np.ndarray] = []
        self._rng = np.random.default_rng(seed)
        self._pending: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @property
    def enabled(self) -> bool:
        return self.pool_size > 0

    def presample(self, shape: Tuple[int, ...]) -> Tuple[np.ndarray, np.ndarray]:
        """(old_batch[B,...], use_old_mask[B]) for a batch of `shape`.

        Mirrors image_pool.py:11-30 per sample: while the pool isn't full the
        new sample is stored and used (mask 0); once full, with p>0.5 a random
        stored sample is returned and later replaced by the new one.
        """
        b = shape[0]
        old = np.zeros(shape, np.float32)
        mask = np.zeros((b,), bool)
        slots = np.full((b,), -1, np.int64)
        for i in range(b):
            if len(self.images) + int((slots[:i] == -2).sum()) < self.pool_size:
                slots[i] = -2  # append slot
            elif (
                self.enabled
                and len(self.images) == self.pool_size  # actually full: stored
                # samples exist for every slot.  While pending appends from
                # THIS batch only virtually fill the pool, fall through and
                # use the new fake (the reference would swap against a fake
                # appended earlier in the same batch, which presample cannot
                # see — using the current fake is the closest equivalent).
                and self._rng.uniform() > 0.5
            ):
                j = int(self._rng.integers(0, self.pool_size))
                old[i] = self.images[j]
                mask[i] = True
                slots[i] = j  # replace slot
        self._pending = slots
        return old, mask

    def commit(self, fakes: np.ndarray) -> None:
        """Apply the pool mutations decided by the last presample().

        ``fakes`` may carry fewer rows than presample() drew decisions for:
        the final partial batch per epoch commits only its real rows, and
        the padding rows' pending decisions are dropped (the reference's
        remainder batch only ever inserts its real images)."""
        if not self.enabled or self._pending is None:
            return
        slots = self._pending
        self._pending = None
        for i, s in enumerate(slots[: len(fakes)]):
            if s == -2:
                self.images.append(np.asarray(fakes[i]))
            elif s >= 0:
                self.images[int(s)] = np.asarray(fakes[i])
