"""Step-level A/B of the UpsampledConv method (usage: python tools/ab_upsample_step.py {auto|dilated|phase|dense})."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import train_step_scan_ms
from flagship_setup import flagship_state
from mdctgan_tpu.ops.features import SpectralTransform
from mdctgan_tpu.parallel.mesh import enable_compilation_cache
from mdctgan_tpu.train.step import build_train_step

enable_compilation_cache("/tmp/mdctgan_jax_cache")
method = sys.argv[1]
os.environ["MDCTGAN_UPSAMPLE_METHOD"] = method
cfg, gen, disc, g_tx, d_tx, state, mkbatch, key = flagship_state(20)
tf_ = SpectralTransform(cfg)
step = build_train_step(gen, disc, tf_, g_tx, d_tx, donate=False)
ms = train_step_scan_ms(step, state, mkbatch(), key)
print(f"[ab-step] upsample={method}: {ms:.2f} ms/step", flush=True)
