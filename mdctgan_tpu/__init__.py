"""mdctgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech super-resolution GAN framework.

A ground-up rebuild of the capabilities of neoncloud/mdctGAN (INTERSPEECH 2023):
waveform -> MDCT spectra -> pix2pixHD-style GAN (global generator + local
enhancer with bottleneck-transformer attention) -> IMDCT -> waveform.

Design is TPU-first:
  * MDCT/IMDCT are expressed as MXU matmuls (DCT-IV as a dense N x N/2 cosine
    matrix) with optional fused Pallas kernels folding window + range
    compression, instead of the reference's cuFFT + torch_scatter path
    (reference: models/mdct.py).
  * Models are Flax modules compiled once under jit; static shapes everywhere.
  * Scaling is via jax.sharding.Mesh + NamedSharding (data-parallel batch
    sharding, replicated params), not NCCL/DataParallel.
  * The input degradation pipeline (resample down/up + noise) runs on-device
    as strided convolutions.
"""

__version__ = "0.1.0"

from mdctgan_tpu.ops.window import kbd_window  # noqa: F401
from mdctgan_tpu.ops.mdct import MDCT, IMDCT, mdct, imdct  # noqa: F401
