#!/usr/bin/env python
"""A/B three implementations of the pix2pixHD upsample block's fused
nearest-2x+conv (models/layers.py UpsampledConv) on the real chip:

  dense   — materialize the 2x tensor, plain convs (the reference's form)
  phase   — polyphase kernel bank + depth-to-space (shipped round 1)
  dilated — ONE lhs-dilated conv with K' = K correlated with [1,1] per
            spatial dim (exactly equal math; no phase bank, no
            depth-to-space shuffles — the TPU conv emitter handles
            input-dilated convs natively, as in every backward pass)

Times fwd+bwd of the conv1(5x5,p1)+conv_res(3x3,p1) pair at flagship
call-site geometries via the carried-dependency scan."""
import sys

from flagship_setup import flagship_state  # noqa: F401 (sys.path side effect)

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_time_scan
from mdctgan_tpu.models.layers import upsample_nearest_2x
from mdctgan_tpu.parallel.mesh import enable_compilation_cache

DN = ("NHWC", "HWIO", "NHWC")


def conv_dense(x, K, p):
    xu = upsample_nearest_2x(x)
    xu = jnp.pad(xu, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(xu, K, (1, 1), "VALID",
                                        dimension_numbers=DN)


def widen(K):
    Kp = (jnp.pad(K, ((0, 1), (0, 0), (0, 0), (0, 0)))
          + jnp.pad(K, ((1, 0), (0, 0), (0, 0), (0, 0))))
    return (jnp.pad(Kp, ((0, 0), (0, 1), (0, 0), (0, 0)))
            + jnp.pad(Kp, ((0, 0), (1, 0), (0, 0), (0, 0))))


def conv_dilated(x, K, p):
    return jax.lax.conv_general_dilated(
        x, widen(K), (1, 1), padding=((p + 1, p + 1), (p + 1, p + 1)),
        lhs_dilation=(2, 2), dimension_numbers=DN)


def conv_phase(x, K, p):
    from mdctgan_tpu.models.layers import _UpsampledConvInner

    k = K.shape[0]
    m = _UpsampledConvInner(K.shape[-1], k, p, method="phase")
    return m.apply({"params": {"kernel": K,
                               "bias": jnp.zeros((K.shape[-1],))}}, x)


def main():
    enable_compilation_cache("/tmp/mdctgan_jax_cache")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for (h, w, ci, co) in ((64, 128, 112, 56), (32, 64, 224, 112),
                           (16, 32, 448, 224)):
        x = jnp.asarray(rng.standard_normal((20, h, w, ci)), dt)
        K5 = jnp.asarray(rng.standard_normal((5, 5, ci, co)) * 0.05, dt)
        K3 = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, dt)

        for name, conv in (("dense", conv_dense), ("phase", conv_phase),
                           ("dilated", conv_dilated)):
            def fwd_bwd(xx, Ks):
                K5_, K3_ = Ks

                def loss(v, a, b):
                    y1 = conv(v, a, 1)
                    y2 = conv(v, b, 1)
                    return (jnp.sum(y1.astype(jnp.float32) ** 2)
                            + jnp.sum(y2.astype(jnp.float32) ** 2))

                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(xx, K5_, K3_)
                tot = l + sum(jnp.sum(gg.astype(jnp.float32)) for gg in g)
                return tot.astype(xx.dtype)  # keep the scan carry dtype

            ms = device_time_scan(fwd_bwd, x, consts=(K5, K3),
                                  n_lo=4, n_hi=54, reps=3)
            print(f"({h},{w},{ci}->{co}) {name:8s}: {ms:.3f} ms fwd+bwd",
                  flush=True)


if __name__ == "__main__":
    main()
