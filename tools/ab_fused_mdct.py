"""A/B the fused Pallas MDCT+normalize vs XLA on the real TPU, at several
batch sizes (the auto gate threshold is batch >= 8)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import device_time_scan
from mdctgan_tpu.ops.mdct import MDCT
from mdctgan_tpu.ops.pallas_mdct import is_tpu, mdct_spectro_fused
from mdctgan_tpu.parallel.mesh import enable_compilation_cache
enable_compilation_cache("/tmp/mdctgan_jax_cache")
print("devices:", jax.devices(), flush=True)
assert is_tpu()
rng = np.random.default_rng(0)
m = MDCT(512)
LN10 = float(np.log(10.0))
for bsz in (1, 8, 20, 64):
    x = jnp.asarray(rng.standard_normal((bsz, 32512)), jnp.float32)
    fused = device_time_scan(lambda a: mdct_spectro_fused(a, gain=1000.0, scale=0.5, shift=0.25), x)
    xla = device_time_scan(lambda a: jnp.arcsinh(1000.0 * m(a)) / LN10 * 0.5 + 0.25, x)
    print(f"batch {bsz:3d}: fused {fused:.4f} ms  xla {xla:.4f} ms  ratio {xla/fused:.2f}x", flush=True)
