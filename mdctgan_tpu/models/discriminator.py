"""PatchGAN discriminators (Flax, NHWC).

Re-designs of ``NLayerDiscriminator`` (reference networks.py:641-692) and
``MultiscaleDiscriminator`` (networks.py:507-550).  Each scale returns the
list of intermediate features (the reference's ``getIntermFeat``) for the
feature-matching loss; the final element is the patch logit map.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdctgan_tpu.models.layers import (
    Conv,
    auto_phases,
    avg_pool_3x3_s2,
    instance_norm,
    leaky_relu,
)

Array = jax.Array


class NLayerDiscriminator(nn.Module):
    """70x70-style PatchGAN: 4x4 convs, stride 2 (capped at 512 ch), one
    stride-1 stage, then a 1-channel logit conv (networks.py:641-692)."""

    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        # padw = ceil((4-1)/2) = 2.  layer0 is the one D conv whose channel
        # count underfills the MXU's output lanes; 2-column phasing measured
        # 1.65x fwd / 1.47x bwd ISOLATED on v5e but regressed in-graph, so
        # auto_phases ships disabled (see its docstring).  Deeper layers
        # (>= 128 ch) measured slower phased even isolated — always dense.
        h = Conv(self.ndf, 4, 2, 2,
                 phases=min(auto_phases(self.ndf), 2),
                 dtype=self.dtype, name="layer0")(x)
        h = leaky_relu(h)
        feats.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv(nf, 4, 2, 2, dtype=self.dtype, name=f"layer{n}")(h)
            h = leaky_relu(instance_norm(h))
            feats.append(h)
        nf = min(nf * 2, 512)
        h = Conv(nf, 4, 1, 2, dtype=self.dtype, name=f"layer{self.n_layers}")(h)
        h = leaky_relu(instance_norm(h))
        feats.append(h)
        h = Conv(1, 4, 1, 2, dtype=self.dtype, name=f"layer{self.n_layers + 1}")(h)
        h = h.astype(jnp.float32)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over a stride-2 avg-pool pyramid (networks.py:507-550).

    Returns a list (coarsest scale first, matching the reference's
    ``num_D-1-i`` indexing) of per-scale feature lists.
    """

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 3
    use_sigmoid: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> List[List[Array]]:
        results = []
        current = x
        for i in range(self.num_D):
            # scale index num_D-1-i sees the i-times-downsampled input
            d = NLayerDiscriminator(
                self.ndf, self.n_layers, self.use_sigmoid, dtype=self.dtype,
                name=f"scale{self.num_D - 1 - i}",
            )
            results.append(d(current))
            if i != self.num_D - 1:
                current = avg_pool_3x3_s2(current)
        return results


def build_discriminator(opt) -> MultiscaleDiscriminator:
    """Factory mirroring networks.define_D (networks.py:59-68)."""
    get = (lambda k, d=None: getattr(opt, k, d)) if not isinstance(opt, dict) else opt.get
    return MultiscaleDiscriminator(
        ndf=get("ndf", 64),
        n_layers=get("n_layers_D", 3),
        num_D=get("num_D", 2),
        use_sigmoid=bool(get("no_lsgan", False)),
        dtype=jnp.bfloat16 if get("fp16", False) else None,
    )
