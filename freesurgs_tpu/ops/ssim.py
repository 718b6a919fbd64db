"""SSIM with an 11x11 Gaussian window (pure jnp, differentiable).

Matches the reference's training-loss SSIM (``utils/loss_utils.py:56-96``):
sigma 1.5, window 11, SAME zero-padding depthwise convolutions, C1=0.01^2,
C2=0.03^2, mean over the full map.

Implementation: the separable blur runs as BANDED-MATRIX MATMULS on the
MXU — ``blur_axis(x) = x @ B`` with B the (n, n) 11-diagonal Gaussian
band — in f32 at ``Precision.HIGHEST``. Why not the alternatives (all
measured on v5e at (3, 1024, 1280), fwd+bwd):

- ``lax.conv_general_dilated`` at Precision.HIGHEST: 16.4 ms (the
  round-3 implementation, validated in the round-3 full run). DEFAULT
  precision is not an option at all: TPU convs then truncate operands to
  bf16 and the variance terms ``E[x^2] - mu^2`` carry ~1e-3 absolute
  error — larger than C2 = 9e-4 — so the SSIM denominator can cross
  ZERO on low-texture windows: SSIM > 1, unbounded map values, inf/NaN
  gradients (the round-2 full-res divergence; CPU runs — f32 convs —
  were clean, which is why tests never caught it).
- a MANUAL 2x2 bf16 split of both operands at DEFAULT precision
  (``mm(xh,Bh)+mm(xh,Bl)+mm(xl,Bh)+mm(xl,Bl)``): mathematically ~2^-17,
  5.3 ms — but it REINTRODUCED the divergence in the round-4 full run
  (frame-0 rgb loss NEGATIVE, i.e. SSIM > 1: variance error back at the
  ~1e-3 bf16 level). On TPU the compiled arithmetic did not preserve the
  split (consistent with XLA's dot-merging/algebraic simplification
  folding ``mm(xh,B)+mm(xl,B)`` into ``mm(xh+xl, B)`` with the operand
  add in bf16 — which exactly cancels the lo term). A hand split at
  DEFAULT precision is NOT a safe contract; HIGHEST is, because the
  3-pass decomposition happens inside the dot lowering itself.
- shift-and-add slices (sum_k w[k] * slice_k): 7.4 ms runtime but a
  134.9 s XLA compile for the gradient (vs ~11 s here) — it also blew
  the CPU test-suite compile times up by an order of magnitude.

The f32/HIGHEST banded matmul keeps the MXU-friendly structure (the
1280/11 "wasted" band FLOPs are free at these sizes) with the precision
contract enforced by the lowering, not by simplifier-fragile operand
algebra. The five moment fields are batched into ONE stacked blur
(linearity), so the pass count does not scale with the number of
moments.
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


@functools.lru_cache(maxsize=8)
def _band_matrix(n: int, window_size: int = 11,
                 sigma: float = 1.5) -> np.ndarray:
    """(n, n) banded correlation matrix: (x @ B)[i] = sum_k w[k] *
    x[i + k - half], rows outside [0, n) dropped == SAME zero padding."""
    w = _gauss_window(window_size, sigma)
    B = np.zeros((n, n), np.float32)
    half = window_size // 2
    for j in range(window_size):
        off = j - half
        idx = np.arange(max(0, -off), min(n, n - off))
        B[idx + off, idx] = w[j]
    return B


def _blur_axis1_mm(x: jnp.ndarray, window_size: int,
                   sigma: float) -> jnp.ndarray:
    """Blur axis 1 of a rank-3 array via the banded matmul; the
    contracted axis lands at the END, so the output is x transposed:
    (C, H, W) -> (C, W, blur(H)).

    Precision.HIGHEST is load-bearing (see module docstring): the
    variance terms downstream cancel to ~C2 = 9e-4 scale, and any bf16
    truncation of the operands reintroduces the full-res divergence."""
    B = jnp.asarray(_band_matrix(x.shape[1], window_size, sigma))
    return jax.lax.dot_general(x, B, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _blur(img: jnp.ndarray, window_size: int = 11,
          sigma: float = 1.5) -> jnp.ndarray:
    """Depthwise separable Gaussian blur of (C, H, W), SAME zero pad."""
    y = _blur_axis1_mm(img, window_size, sigma)   # (C, W, H)
    return _blur_axis1_mm(y, window_size, sigma)  # (C, H, W)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM of two (C, H, W) images in [0, 1]."""
    # One stacked blur for all five moment fields (blur is linear).
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    b = _blur(stacked, window_size, sigma)
    c = img1.shape[0]
    mu1, mu2 = b[0:c], b[c:2 * c]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[2 * c:3 * c] - mu1_sq
    sigma2_sq = b[3 * c:4 * c] - mu2_sq
    sigma12 = b[4 * c:5 * c] - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2.0 * mu12 + c1) * (2.0 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return jnp.mean(ssim_map)
