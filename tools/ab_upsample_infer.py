"""Batch-1 inference A/B of the UpsampledConv method (usage: python tools/ab_upsample_infer.py {dilated|dense|phase})."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
method = sys.argv[1]
os.environ["MDCTGAN_UPSAMPLE_METHOD"] = method
import jax, jax.numpy as jnp, numpy as np
from bench import device_time_scan
from mdctgan_tpu.configs import flagship_generator, flagship_spectral
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.train.step import build_inference_fn
from mdctgan_tpu.parallel.mesh import enable_compilation_cache
enable_compilation_cache("/tmp/mdctgan_jax_cache")
rng = np.random.default_rng(0)
cfg = flagship_spectral()
tf_ = SpectralTransform(cfg)
gen = flagship_generator()
g_vars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_bins, cfg.n_fft // 2, 2)), train=False)
infer = build_inference_fn(gen, tf_, out_length=cfg.segment_length)
lr = jnp.asarray(0.1 * rng.standard_normal((1, cfg.segment_length)), jnp.float32)
ms = device_time_scan(lambda a, v: infer(v, a)[1][..., : cfg.segment_length],
                      lr, consts=g_vars, n_lo=2, n_hi=26, reps=4)
print(f"[ab-infer] batch1 upsample={method}: {ms:.2f} ms/segment", flush=True)
