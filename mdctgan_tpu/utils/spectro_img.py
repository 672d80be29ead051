"""Spectrogram/histogram/phase visual rendering (reference util/spectro_img.py:4-29).

matplotlib agg-backend rendering of a normalized MDCT spectrogram into RGB
arrays for TensorBoard / the HTML gallery.  Gated: returns None when
matplotlib is unavailable so headless training never depends on it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), np.uint8).reshape(h, w, 4)
    return buf[..., :3].copy()


def compute_visuals(
    spectro: Optional[np.ndarray] = None,
    pha: Optional[np.ndarray] = None,
    abs_spectro: bool = False,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """(spectro_img, hist_img, pha_img) RGB uint8 arrays (spectro_img.py:9-29).

    ``spectro`` is a single (F, K) normalized spectrogram in the model's
    (time, freq) layout; like the reference it is transposed before
    rendering so frequency runs along the vertical axis.  ``abs_spectro``
    mirrors the reference's ``abs`` flag (get_current_visuals passes
    opt.abs_spectro, pix2pixHD_model.py:684-691): the map is rendered as
    magnitude while the histogram stays on the signed values.
    """
    if not _HAVE_MPL:
        return None, None, None
    spec_img = hist_img = pha_img = None
    if spectro is not None:
        s = np.asarray(spectro).squeeze().T  # reference: sp.transpose()
        fig, ax = plt.subplots(figsize=(6, 4), dpi=80)
        m = ax.pcolormesh(np.abs(s) if abs_spectro else s, cmap="magma")
        fig.colorbar(m, ax=ax)
        spec_img = _fig_to_rgb(fig)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(6, 4), dpi=80)
        ax.hist(s.ravel(), bins=100)
        hist_img = _fig_to_rgb(fig)
        plt.close(fig)
    if pha is not None:
        p = np.asarray(pha).squeeze().T
        fig, ax = plt.subplots(figsize=(6, 4), dpi=80)
        m = ax.pcolormesh(p, cmap="coolwarm")
        fig.colorbar(m, ax=ax)
        pha_img = _fig_to_rgb(fig)
        plt.close(fig)
    return spec_img, hist_img, pha_img


def display_spectra(cfg, lr_spec, sr_spec, hr_spec, lr_np, hr_np):
    """Denormalized display visuals (pix2pixHD_model.py:568-613).

    The reference registers visuals in the DENORMALIZED (arcsinh/dB) domain:
    normalized [-1,1] values mapped back through the norm params, with the
    SR spectro denormalized by the **LR** params and clipped to the HR
    min/max.  explicit_encoding instead shows the mean of the two sign
    channels; any other mode shows the raw normalized spectro.

    Inputs are (B, C, F, K) spectro arrays + their norm params; returns the
    {lr,sr,hr}_spectro dict of (F, K) arrays for the Visualizer.
    """
    lr = np.asarray(lr_spec, np.float32)
    sr = np.asarray(sr_spec, np.float32)
    hr = np.asarray(hr_spec, np.float32)
    if cfg.explicit_encoding:  # overrides, as in the reference (:593-600)
        return {
            "lr_spectro": 0.5 * (lr[0, 0] + lr[0, 1]),
            "sr_spectro": 0.5 * (sr[0, 0] + sr[0, 1]),
            "hr_spectro": 0.5 * (hr[0, 0] + hr[0, 1]),
        }
    if not cfg.arcsinh_transform:  # raw fallback (:586-591)
        return {"lr_spectro": lr[0, 0], "sr_spectro": sr[0, 0],
                "hr_spectro": hr[0, 0]}
    lo, hi = cfg.norm_range
    span = hi - lo

    def denorm(x, p):
        u = (x - lo) / span
        pmin = np.asarray(p["min"], np.float32)
        pmax = np.asarray(p["max"], np.float32)
        return u * (pmax - pmin) + pmin

    gen = denorm(sr, lr_np)  # LR params, deliberately (:578-580)
    gen = np.clip(gen, np.asarray(hr_np["min"], np.float32),
                  np.asarray(hr_np["max"], np.float32))
    return {
        "lr_spectro": denorm(lr, lr_np)[0, 0],
        "sr_spectro": gen[0, 0],
        "hr_spectro": denorm(hr, hr_np)[0, 0],
    }
