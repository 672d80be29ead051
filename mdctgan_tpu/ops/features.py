"""Waveform <-> normalized MDCT-spectrogram "image" feature pipeline.

TPU-native, stateless re-design of the reference ``Audio2MDCT`` preprocessor
(reference: models/pix2pixHD_model.py:14-200).  Everything here is a pure
function of (config, arrays, PRNG key) so the whole pipeline lives inside the
jitted train step — no host round trips, no module state.

Normalization modes (pix2pixHD_model.py:83-125):
  * ``arcsinh``  — asinh(gain*x)/ln(10)   (the shipped config, train.sh)
  * ``explicit`` — dual-channel +/- dB encoding with mixing factor alpha
  * ``raw``      — identity
  * ``db``       — 20*log10(|x| + min_value) (amplitude_to_DB with amin)
followed by an affine map from [min, max] (per-sample or the fixed
``src_range`` when ``abs_norm``) onto ``norm_range``.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.ops.mdct import MDCT, IMDCT

Array = jax.Array
_LN10 = float(np.log(10.0))


def _single_tpu() -> bool:
    try:
        devs = jax.devices()
        return len(devs) == 1 and devs[0].platform == "tpu"
    except Exception:
        return False


def _tpu_mesh(mesh) -> bool:
    return mesh is not None and all(
        d.platform == "tpu" for d in mesh.devices.flat
    )


@dataclasses.dataclass(frozen=True)
class SpectralConfig:
    """Static configuration of the waveform<->spectrogram transform.

    Field names track the reference CLI flags (options/base_options.py,
    options/train_options.py) so configs translate one-to-one.
    """

    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    center: bool = True
    lr_sampling_rate: int = 16000
    hr_sampling_rate: int = 48000
    sr_sampling_rate: int = 48000
    segment_length: int = 32512
    # normalization
    arcsinh_transform: bool = True
    arcsinh_gain: float = 1000.0
    explicit_encoding: bool = False
    alpha: float = 0.6
    raw_mdct: bool = False
    abs_norm: bool = True
    src_range: Tuple[float, float] = (-5.0, 5.0)
    norm_range: Tuple[float, float] = (-1.0, 1.0)
    min_value: float = 1e-7
    # masking / residual
    mask: bool = False
    mask_hr: bool = False
    fit_residual: bool = True
    abs_spectro: bool = True

    @property
    def up_ratio(self) -> float:
        return self.hr_sampling_rate / self.lr_sampling_rate

    @property
    def n_bins(self) -> int:
        """Time bins for a fixed segment (128 for the default geometry)."""
        t = self.segment_length
        start = self.hop_length if self.center else 0
        total = t + 2 * start + (-t) % self.hop_length
        return (total - self.win_length) // self.hop_length + 1

    @property
    def lr_mask_size(self) -> int:
        """High-frequency columns to mask on the LR spectrogram
        (pix2pixHD_model.py:60-61)."""
        return int((self.n_fft // 2) * (1 - 1 / self.up_ratio))

    @property
    def hr_mask_size(self) -> int:
        """Mask size used by hr_forward (pix2pixHD_model.py:197-198)."""
        return int(self.n_fft * (1 - self.sr_sampling_rate / self.hr_sampling_rate) // 2)


def amplitude_to_db(x: Array, amin: float) -> Array:
    """torchaudio.functional.amplitude_to_DB with multiplier=20, db_mult=1."""
    return 20.0 * jnp.log10(jnp.maximum(x, amin)) - 20.0


def db_to_amplitude(x: Array, ref: float = 10.0, power: float = 0.5) -> Array:
    """torchaudio.functional.DB_to_amplitude: ref * 10^(x*power/10)."""
    return ref * jnp.power(10.0, x * power / 10.0)


class SpectralTransform:
    """Bundles MDCT/IMDCT kernels + the normalization config.

    ``use_fused``: route ``to_spectro``/``to_audio`` through the fused Pallas
    MDCT/IMDCT+normalize kernels (ops/pallas_mdct.py) instead of the XLA
    matmul + elementwise pipeline.  ``None`` (default) auto-enables it when
    (a) the config is fused-compatible (arcsinh + abs_norm, hop = win/2,
    center), and (b) exactly one TPU device is attached OR a batch-sharded
    ``mesh`` is provided.  Under a mesh the kernels are dispatched through
    ``shard_map`` over the leading (batch-sharded) axis, so every DP shard
    runs the Pallas kernel on its local batch — an opaque pallas custom-call
    left to GSPMD would instead force operand all-gathers.  Batches not
    divisible by the mesh size (ragged inference tails) fall back to the
    unsharded call.  ``fused_interpret`` runs the kernels in the Pallas
    interpreter (CPU tests).
    """

    def __init__(
        self,
        cfg: SpectralConfig,
        dtype=jnp.float32,
        use_fused: Optional[bool] = None,
        fused_interpret: bool = False,
        mesh=None,
    ):
        self.cfg = cfg
        self.mdct = MDCT(
            cfg.n_fft, cfg.hop_length, cfg.win_length, "kbd", cfg.center, dtype=dtype
        )
        self.imdct = IMDCT(
            cfg.n_fft,
            cfg.hop_length,
            cfg.win_length,
            "kbd",
            cfg.center,
            out_length=None,
            dtype=dtype,
        )
        self.fused_interpret = fused_interpret
        self.mesh = mesh
        compatible = self._fused_compatible(dtype)
        # Auto mode only engages the pallas path for batches >= 8: at batch 1
        # the custom call's fixed output layout degrades XLA's layout choices
        # for the downstream convs (measured +1.85 ms/segment on flagship
        # inference), while at train batches it's neutral-to-positive.
        # Explicit use_fused=True (--fused_mdct on) applies at any batch.
        auto = use_fused is None
        self.fused_min_batch = 8 if auto else 1
        if use_fused is None:
            use_fused = compatible and (_single_tpu() or _tpu_mesh(mesh))
        elif use_fused and not compatible:
            raise ValueError(
                "use_fused=True requires arcsinh_transform + abs_norm with "
                "hop = win/2 = n_fft/2, center=True, float32, and an "
                "increasing src_range/norm_range affine"
            )
        self.use_fused = bool(use_fused)
        # stderr: bench.py's stdout contract is a single JSON line
        if self.use_fused:
            gate = ("any batch" if self.fused_min_batch == 1
                    else f"batch >= {self.fused_min_batch}")
            print(f"[transform] fused pallas MDCT path enabled ({gate})",
                  file=sys.stderr)
        else:
            why = ("config incompatible" if not compatible
                   else "no single-TPU/TPU-mesh target" if auto
                   else "--fused_mdct off")
            print(f"[transform] XLA MDCT path ({why})", file=sys.stderr)

    def _fused_compatible(self, dtype) -> bool:
        cfg = self.cfg
        return (
            cfg.arcsinh_transform
            and not cfg.explicit_encoding
            and not cfg.raw_mdct
            and cfg.abs_norm
            and cfg.center
            and cfg.win_length == cfg.n_fft
            and cfg.hop_length * 2 == cfg.win_length
            and dtype == jnp.float32
            and cfg.src_range[1] > cfg.src_range[0]
            and cfg.norm_range[1] > cfg.norm_range[0]
        )

    def _shard_mapped(self, fn, x: Array) -> Array:
        """Run ``fn`` per-shard over the mesh's leading axis (DP batch);
        plain call when unsharded or the batch doesn't divide evenly."""
        if self.mesh is None or self.mesh.size == 1 or x.shape[0] % self.mesh.size:
            return fn(x)
        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        # vma/rep checking doesn't see through pallas_call — disable.
        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=(P(axis),), out_specs=P(axis),
            check_vma=False,
        )(x)

    def _fused_affine(self) -> Tuple[float, float]:
        """normalize() collapsed to one affine: out = asinh(g*x)/ln10 * scale
        + shift (valid because abs_norm makes lo/hi static constants)."""
        cfg = self.cfg
        lo, hi = cfg.src_range
        scale = (cfg.norm_range[1] - cfg.norm_range[0]) / (hi - lo)
        shift = cfg.norm_range[0] - lo * scale
        return scale, shift

    # ------------------------------------------------------------------ #
    # normalize / denormalize (pix2pixHD_model.py:83-137)
    # ------------------------------------------------------------------ #
    def normalize(self, spectro: Array):
        cfg = self.cfg
        if cfg.explicit_encoding:
            neg = 0.5 * (jnp.abs(spectro) - spectro)
            pos = spectro + neg
            log_spectro = jnp.concatenate(
                (
                    amplitude_to_db(cfg.alpha * pos + (1 - cfg.alpha) * neg, cfg.min_value),
                    amplitude_to_db((1 - cfg.alpha) * pos + cfg.alpha * neg, cfg.min_value),
                ),
                axis=1,
            )
        elif cfg.arcsinh_transform:
            log_spectro = jnp.arcsinh(cfg.arcsinh_gain * spectro) / _LN10
        elif cfg.raw_mdct:
            log_spectro = spectro
        else:
            log_spectro = amplitude_to_db(jnp.abs(spectro) + cfg.min_value, cfg.min_value)

        if cfg.abs_norm:
            lo = jnp.full((1, 1, 1, 1), cfg.src_range[0], log_spectro.dtype)
            hi = jnp.full((1, 1, 1, 1), cfg.src_range[1], log_spectro.dtype)
        else:
            hi = jnp.max(log_spectro, axis=(-2, -1), keepdims=True)
            lo = jnp.min(log_spectro, axis=(-2, -1), keepdims=True)
        out = (log_spectro - lo) / (hi - lo)
        out = out * (cfg.norm_range[1] - cfg.norm_range[0]) + cfg.norm_range[0]
        return out, {"max": hi, "min": lo}

    def denormalize(self, log_spectro: Array, lo: Array, hi: Array) -> Array:
        cfg = self.cfg
        x = (log_spectro - cfg.norm_range[0]) / (cfg.norm_range[1] - cfg.norm_range[0])
        x = x * (hi - lo) + lo
        if cfg.arcsinh_transform:
            return jnp.sinh(x * _LN10) / cfg.arcsinh_gain
        if cfg.raw_mdct:
            return x
        # dB inverse — also the explicit_encoding path (pix2pixHD_model.py:137).
        return db_to_amplitude(x) - cfg.min_value

    # ------------------------------------------------------------------ #
    # waveform -> normalized spectro image (pix2pixHD_model.py:32-81)
    # ------------------------------------------------------------------ #
    def to_spectro(
        self,
        audio: Array,
        mask: bool = False,
        mask_size: int = -1,
        rng: Optional[Array] = None,
    ):
        cfg = self.cfg
        if self.use_fused and audio.shape[0] >= self.fused_min_batch:
            from mdctgan_tpu.ops.pallas_mdct import mdct_spectro_fused

            scale, shift = self._fused_affine()
            log_spectro = self._shard_mapped(
                lambda a: mdct_spectro_fused(
                    a,
                    cfg.n_fft,
                    cfg.hop_length,
                    cfg.win_length,
                    gain=cfg.arcsinh_gain,
                    scale=scale,
                    shift=shift,
                    interpret=self.fused_interpret,
                ),
                audio,
            )[:, None]  # (B, 1, F, K) NCHW image
            # sign(x) == sign(asinh(g x) * scale) == sign(out - shift) since
            # scale > 0; exact at 0 (out == shift there).  pha is decorative
            # on this (arcsinh) path — to_audio never consumes it.
            pha = jnp.sign(log_spectro - shift)
            dt = log_spectro.dtype
            norm_param = {
                "max": jnp.full((1, 1, 1, 1), cfg.src_range[1], dt),
                "min": jnp.full((1, 1, 1, 1), cfg.src_range[0], dt),
            }
        else:
            spectro = self.mdct(audio)[:, None]  # (B, 1, F, K) NCHW image
            pha = jnp.sign(spectro)
            log_spectro, norm_param = self.normalize(spectro)
        # The reference draws independent noises for the phase jitter and the
        # mask fill — split the key so the two streams stay uncorrelated.
        rng_pha = rng_fill = None
        if rng is not None:
            rng_pha, rng_fill = jax.random.split(rng)
        if not cfg.explicit_encoding and rng_pha is not None:
            # Decorative phase jitter (pix2pixHD_model.py:49-54); only the
            # non-arcsinh inference path consumes pha at all.
            noise = jax.random.normal(rng_pha, pha.shape, pha.dtype)
            noise = (noise - noise.min()) / (noise.max() - noise.min())
            pha = pha * noise
        if mask:
            if mask_size == -1:
                mask_size = cfg.lr_mask_size
            if mask_size > 0:
                keep = log_spectro[..., :-mask_size]
                shape = (*log_spectro.shape[:-1], mask_size)
                if cfg.fit_residual or rng_fill is None:
                    fill = jnp.zeros(shape, log_spectro.dtype)
                else:
                    fill = jax.random.normal(rng_fill, shape, log_spectro.dtype)
                    fill = fill / (fill.max() - fill.min())
                log_spectro = jnp.concatenate((keep, fill), axis=-1)
        return log_spectro, pha, norm_param

    def lr_forward(self, lr_audio: Array, rng: Optional[Array] = None):
        """LR branch: optional high-band masking (pix2pixHD_model.py:187-192)."""
        return self.to_spectro(lr_audio, mask=self.cfg.mask, rng=rng)

    def hr_forward(self, hr_audio: Array, rng: Optional[Array] = None):
        """HR branch (pix2pixHD_model.py:194-200)."""
        return self.to_spectro(
            hr_audio, mask=self.cfg.mask_hr, mask_size=self.cfg.hr_mask_size, rng=rng
        )

    # ------------------------------------------------------------------ #
    # normalized spectro -> waveform (pix2pixHD_model.py:139-163)
    # ------------------------------------------------------------------ #
    def to_audio(
        self,
        log_spectro: Array,
        norm_param,
        pha: Optional[Array] = None,
        rng: Optional[Array] = None,
        out_length: Optional[int] = None,
    ) -> Array:
        cfg = self.cfg
        if self.use_fused and log_spectro.shape[0] >= self.fused_min_batch:
            # Fused denormalize(sinh) + IMDCT matmul + overlap-add kernel.
            # norm_param is ignored: fused compatibility requires abs_norm,
            # so the params are always the static src_range constants.
            from mdctgan_tpu.ops.pallas_mdct import imdct_audio_fused

            lo, hi = cfg.src_range
            scale = (hi - lo) / (cfg.norm_range[1] - cfg.norm_range[0])
            shift = lo - cfg.norm_range[0] * scale
            audio = self._shard_mapped(
                lambda s: imdct_audio_fused(
                    s,
                    cfg.n_fft,
                    cfg.hop_length,
                    cfg.win_length,
                    gain=cfg.arcsinh_gain,
                    scale=scale,
                    shift=shift,
                    interpret=self.fused_interpret,
                ),
                log_spectro[:, 0],
            )
            if out_length is not None:
                audio = audio[..., :out_length]
            return audio
        spectro = self.denormalize(log_spectro, norm_param["min"], norm_param["max"])
        if cfg.explicit_encoding:
            spectro = (spectro[:, 0] - spectro[:, 1]) / (2 * cfg.alpha - 1)
        elif cfg.arcsinh_transform or cfg.raw_mdct:
            spectro = spectro[:, 0]
        else:
            # Re-attach LR sign; pseudo-random +/-1 phase above the LR band
            # (pix2pixHD_model.py:150-157).
            spectro = spectro[:, 0]
            pha = pha[:, 0]
            if cfg.up_ratio > 1:
                size = pha.shape[-2]
                lr_rows = int(size * (1 / cfg.up_ratio))
                if rng is None:
                    pseudo = jnp.ones_like(pha)
                else:
                    pseudo = (
                        2 * jax.random.randint(rng, pha.shape, 0, 2).astype(pha.dtype)
                        - 1
                    )
                pha = jnp.concatenate(
                    (pha[..., :lr_rows, :], pseudo[..., lr_rows:, :]), axis=-2
                )
                spectro = spectro * pha
        audio = self.imdct(spectro)
        if out_length is not None:
            audio = audio[..., :out_length]
        return audio

    def abs_channel(self, log_spectro: Array) -> Array:
        """Second "abs" input channel when --abs_spectro with arcsinh
        (pix2pixHD_model.py:400-404): |x|*2 + norm_range[0]."""
        return jnp.abs(log_spectro) * 2 + self.cfg.norm_range[0]

    def g_input(self, log_spectro: Array) -> Array:
        if self.cfg.abs_spectro and self.cfg.arcsinh_transform:
            return jnp.concatenate((log_spectro, self.abs_channel(log_spectro)), axis=1)
        return log_spectro
