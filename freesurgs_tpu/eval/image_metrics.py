"""Image quality metrics: PSNR / SSIM / LPIPS.

Mirrors the reference's ``rgb_evaluation`` (``utils/general_utils.py:24-50``):
- PSNR: mean over frames of -10 log10(per-frame MSE)
- SSIM: per-frame channel-averaged structural similarity (the reference
  uses skimage with data_range=1; we evaluate with our jnp SSIM which
  matches the reference's *training* SSIM — 11x11 Gaussian window — and
  fall back to skimage when available for exact eval parity)
- LPIPS: AlexNet v0.1 via the ``lpips`` package when installed; otherwise
  returns NaN with a warning flag (the package needs pretrained weights
  that a zero-egress environment may not have).
"""

from __future__ import annotations

import numpy as np


def psnr(gts: np.ndarray, preds: np.ndarray) -> float:
    """(T, 3, H, W) in [0, 1]."""
    gts = np.asarray(gts, np.float32)
    preds = np.asarray(preds, np.float32)
    mse = ((gts - preds) ** 2).mean(axis=(1, 2, 3))
    return float((-10.0 * np.log10(np.maximum(mse, 1e-12))).mean())


def _ssim_skimage_single(a: np.ndarray, b: np.ndarray,
                         data_range: float = 1.0,
                         win: int = 7) -> float:
    """skimage.metrics.structural_similarity semantics (uniform 7x7
    window, sample covariance normalization N/(N-1), crop-to-valid mean),
    reimplemented on scipy so eval parity holds without skimage installed.
    a, b: (H, W) single channel."""
    from scipy.ndimage import uniform_filter
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    ndw = win * win
    cov_norm = ndw / (ndw - 1)
    ux = uniform_filter(a, win)
    uy = uniform_filter(b, win)
    uxx = uniform_filter(a * a, win)
    uyy = uniform_filter(b * b, win)
    uxy = uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = (((2 * ux * uy + c1) * (2 * vxy + c2))
                / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    pad = (win - 1) // 2
    return float(ssim_map[pad:-pad, pad:-pad].mean())


def ssim_metric(gts: np.ndarray, preds: np.ndarray) -> float:
    try:
        from skimage.metrics import structural_similarity
        vals = [structural_similarity(
            np.moveaxis(g, 0, -1), np.moveaxis(p, 0, -1), data_range=1,
            channel_axis=2) for g, p in zip(gts, preds)]
        return float(np.mean(vals))
    except ImportError:
        # channel_axis SSIM = mean over per-channel SSIMs
        vals = [np.mean([_ssim_skimage_single(g[c], p[c])
                         for c in range(g.shape[0])])
                for g, p in zip(gts, preds)]
        return float(np.mean(vals))


def lpips_metric(gts: np.ndarray, preds: np.ndarray) -> tuple[float, str]:
    """AlexNet LPIPS v0.1 (reference parity). Returns (value, backend).

    Backend resolution order:
      "weights"         — native jnp net + exported pretrained weights
                          (scripts/export_lpips_weights.py): full parity
                          with the reference's lpips package, no torch.
      "lpips_pkg"       — the lpips package if importable.
      "random_features" — native jnp net, fixed-seed random trunk. A
                          usable perceptual distance (relative comparisons,
                          trend tracking) but NOT comparable to published
                          LPIPS values; callers should report the backend.
    """
    from .lpips_jax import load_weights, lpips_alex, random_weights
    w = load_weights()
    if w is not None:
        return lpips_alex(gts, preds, w), "weights"
    try:
        import lpips  # type: ignore
        import torch
        metric = lpips.LPIPS(net="alex", version="0.1", verbose=False)
        g = torch.from_numpy(2.0 * np.asarray(gts, np.float32) - 1.0)
        p = torch.from_numpy(2.0 * np.asarray(preds, np.float32) - 1.0)
        with torch.no_grad():
            return float(metric(g, p).mean()), "lpips_pkg"
    except Exception:
        pass
    return lpips_alex(gts, preds, random_weights()), "random_features"


def rgb_evaluation(gts: np.ndarray, preds: np.ndarray) -> dict:
    """Reference-compatible triple over (T, 3, H, W) stacks in [0, 1].

    ``lpips_backend`` records which LPIPS implementation produced the
    value (see ``lpips_metric``) — "random_features" values are internal-
    trend-only, not comparable to published numbers.
    """
    gts = np.clip(np.asarray(gts, np.float32), 0.0, 1.0)
    preds = np.clip(np.asarray(preds, np.float32), 0.0, 1.0)
    lp, backend = lpips_metric(gts, preds)
    return {"psnr": psnr(gts, preds), "ssim": ssim_metric(gts, preds),
            "lpips": lp, "lpips_backend": backend}
