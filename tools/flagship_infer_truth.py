"""Measure the flagship-geometry INFERENCE parity errors (VERDICT r4 #3).

tests/test_flagship_parity.py::test_flagship_inference_waveform_parity
asserts waveform→waveform serving parity at the shipped geometry (ngf 56,
128x256 maps, batch 8, reference train.sh:3-17) against the float64+stock-
torch oracle (tests/test_e2e_inference._oracle_infer — the reference chain
pix2pixHD_model.py:96-137,631-636 in f64).  This probe runs the EXACT test
construction (np.random.default_rng(0); G randomized, then the long clip,
then the filler rows) and prints the live errors the test's bounds must
clear:

  * normalized-domain max |Δsr|           (G output + fit_residual quirk)
  * waveform max |Δ| / oracle scale       (after f64-vs-f32 denorm + IMDCT
                                           + OLA — the denorm slope
                                           d/dy sinh(y ln10)/1000*2.5 hits
                                           ~575x at |y|=5, so spectral dust
                                           amplifies O(100) into the wave)
  * stitched whole-file max |Δ| / scale   (segment unfold + edge-halving
                                           overlap-add at flagship shapes)

Usage:  PYTHONPATH=/root/repo:/root/repo/tests python tools/flagship_infer_truth.py
Runtime: ~5-15 min single-core CPU (torch eval forward at batch 8 + the XLA
compile of the inference fn dominate).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
# FORCE cpu (this shell exports JAX_PLATFORMS=axon — a setdefault would
# silently run the jax side on the remote TPU, measuring MXU default-
# precision numerics instead of the f32 CPU numerics the suite test runs
# under).  MDCTGAN_TRUTH_PLATFORM overrides for a deliberate on-TPU run.
os.environ["JAX_PLATFORMS"] = os.environ.get("MDCTGAN_TRUTH_PLATFORM", "cpu")
from mdctgan_tpu.parallel.mesh import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from test_e2e_inference import _oracle_infer  # noqa: E402
from test_import_gold import (  # noqa: E402
    FLAGSHIP_LOCAL,
    _flax_local,
    _randomize,
    _torch_local,
)

from mdctgan_tpu.data.dataset import AudioAppDataset  # noqa: E402
from mdctgan_tpu.ops.features import SpectralConfig, SpectralTransform  # noqa: E402
from mdctgan_tpu.train import import_torch  # noqa: E402
from mdctgan_tpu.train.step import build_inference_fn  # noqa: E402

BATCH = 8


def main() -> None:
    rng = np.random.default_rng(0)
    cfg = SpectralConfig()
    transform = SpectralTransform(cfg)

    t0 = time.time()
    torch_g = _torch_local(FLAGSHIP_LOCAL)
    _randomize(torch_g, rng)
    torch_g.eval()
    flax_g = _flax_local(FLAGSHIP_LOCAL)
    params, stats = import_torch.import_generator(
        torch_g.state_dict(), flax_g)
    g_vars = {"params": params, "batch_stats": stats}
    print(f"[infer-truth] models built+imported in {time.time()-t0:.0f}s",
          flush=True)

    seg, overlap = cfg.segment_length, 512  # generate_audio.sh gen_overlap
    long_audio = (0.1 * rng.standard_normal(int(2.2 * seg))).astype(
        np.float32)
    ds = AudioAppDataset(long_audio, cfg.hr_sampling_rate, seg, overlap)
    seg_rows = ds.segments_of(long_audio)
    n_seg = seg_rows.shape[0]
    extra = (0.1 * rng.standard_normal((BATCH - n_seg, seg))).astype(
        np.float32)
    rows = np.concatenate([seg_rows, extra], axis=0)
    print(f"[infer-truth] {n_seg} stitch segments + {BATCH - n_seg} filler",
          flush=True)

    t0 = time.time()
    ref_sr, ref_audio = _oracle_infer(torch_g, rows, cfg)
    print(f"[infer-truth] torch+f64 oracle in {time.time()-t0:.0f}s",
          flush=True)

    t0 = time.time()
    infer = build_inference_fn(flax_g, transform, out_length=seg)
    sr, sr_audio = infer(g_vars, jnp.asarray(rows))
    sr, sr_audio = np.asarray(sr), np.asarray(sr_audio)
    print(f"[infer-truth] jax inference (incl. compile) in "
          f"{time.time()-t0:.0f}s", flush=True)

    d_sr = float(np.abs(sr - ref_sr).max())
    scale = float(np.abs(ref_audio).max())
    d_wav = float(np.abs(sr_audio - ref_audio).max())
    ours = ds.stitch(sr_audio[:n_seg])
    theirs = ds.stitch(ref_audio[:n_seg])
    st_scale = float(np.abs(theirs).max())
    d_st = float(np.abs(ours - theirs).max())

    print(f"[infer-truth] normalized-domain max |dsr|: {d_sr:.3e}  "
          f"(test bound 1.2e-3)", flush=True)
    print(f"[infer-truth] waveform max |d|: {d_wav:.3e} = "
          f"{d_wav / scale:.3e} of oracle scale {scale:.3f}  "
          f"(test bound 2e-3 rel)", flush=True)
    print(f"[infer-truth] stitched whole-file max |d|: {d_st:.3e} = "
          f"{d_st / st_scale:.3e} of scale {st_scale:.3f}  "
          f"(test bound 2e-3 rel)", flush=True)


if __name__ == "__main__":
    main()
