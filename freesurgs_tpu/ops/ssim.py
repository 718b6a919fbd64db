"""SSIM with an 11x11 Gaussian window (pure jnp, differentiable).

Matches the reference's training-loss SSIM (``utils/loss_utils.py:56-96``):
sigma 1.5, window 11, SAME zero-padding depthwise convolutions, C1=0.01^2,
C2=0.03^2, mean over the full map. Implemented with two separable 1-D
``lax.conv_general_dilated`` passes — XLA maps these onto the MXU/VPU and
fuses the elementwise tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _gauss_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable Gaussian blur of (C, H, W), SAME zero padding."""
    c = img.shape[0]
    x = img[None]  # (1, C, H, W)
    kh = window.reshape(1, 1, -1, 1)
    kw = window.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    pad = window.shape[0] // 2
    # Precision.HIGHEST is load-bearing: TPU convs otherwise truncate
    # operands to bf16, and the variance terms E[x^2] - mu^2 below then
    # carry ~1e-3 absolute error — larger than C2 = 9e-4 — so the SSIM
    # denominator can cross ZERO on low-texture windows: SSIM > 1,
    # unbounded map values, and inf/NaN gradients (observed as the
    # round-2 full-res divergence: a NEGATIVE rgb loss at frame 0 on
    # TPU while CPU runs — f32 convs — were clean).
    hp = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=c, precision=hp)
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=c, precision=hp)
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM of two (C, H, W) images in [0, 1]."""
    w = jnp.asarray(_gauss_window(window_size, sigma))
    mu1 = _blur(img1, w)
    mu2 = _blur(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _blur(img2 * img2, w) - mu2_sq
    sigma12 = _blur(img1 * img2, w) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2.0 * mu12 + c1) * (2.0 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return jnp.mean(ssim_map)
