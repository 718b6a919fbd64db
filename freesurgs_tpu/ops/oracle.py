"""Reference (oracle) rasterizer: pure jnp, O(N * pixels), differentiable.

Replicates the CUDA tile rasterizer's semantics exactly, but densely — every
pixel evaluates every Gaussian whose tile rect covers the pixel's tile, in
global front-to-back depth order, with the CUDA compositing cutoffs:

- alpha = min(0.99, opacity * exp(power)); skipped when power > 0 or
  alpha < 1/255 (upstream forward.cu)
- a pixel stops compositing at the first Gaussian whose blend would push its
  transmittance below 1e-4; that Gaussian is also NOT composited
- background is added as T_final * bg per channel

The sequential per-pixel blend loop is re-expressed in closed form with
cumulative sums in log-transmittance space, which makes it fully
vectorizable (this same formulation is what the Pallas kernels use, so
oracle == pallas bit-for-bit up to reassociation):

  abar_i    = alpha_i if composable else 0
  T_i       = prod_{j<i} (1 - abar_j)               (exclusive)
  crossed_i = abar_i > 0  and  T_i * (1 - abar_i) < 1e-4
  valid_i   = abar_i > 0  and  no crossed_j for j <= i
  w_i       = abar_i * T_i * valid_i
  out_ch    = sum_i w_i c_i_ch + T_final * bg_ch

jax.grad through this matches the CUDA backward (both treat the hard
cutoffs as non-differentiable).

Used as: the parity oracle for the Pallas kernels (BASELINE config 1), the
CPU fallback implementation, and the small-scale path in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import TILE, ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_order_weights(abar: jnp.ndarray):
    """Closed-form front-to-back compositing weights along axis 0.

    Args:
      abar: (N, ...) effective alphas in front-to-back order (0 = skip).
    Returns:
      (weights (N, ...), T_final (...)) per the CUDA stopping semantics.
    """
    log1m = jnp.log1p(-abar)
    cum_incl = jnp.cumsum(log1m, axis=0)
    cum_excl = cum_incl - log1m
    T_pre = jnp.exp(cum_excl)
    contributes = abar > 0
    crossed = contributes & (T_pre * (1.0 - abar) < T_EPS)
    crossed_incl = jnp.cumsum(crossed.astype(jnp.int32), axis=0)
    valid = contributes & (crossed_incl == 0)
    weights = abar * T_pre * valid
    T_final = jnp.exp(jnp.sum(log1m * valid, axis=0))
    return weights, T_final


def rasterize_oracle(proj: ProjectedGaussians, colors: jnp.ndarray,
                     opacity: jnp.ndarray, height: int, width: int,
                     bg: jnp.ndarray):
    """Densely rasterize N Gaussians to an image.

    Args:
      proj: projected Gaussians (camera-frame stage output).
      colors: (N, C) per-Gaussian channel values.
      opacity: (N,) in [0, 1].
      bg: (C,) background composited as T_final * bg.
    Returns:
      dict with image (C, H, W) and final_T (H, W).
    """
    n, nch = colors.shape
    order = jnp.argsort(jnp.where(proj.radius > 0, proj.depth, jnp.inf),
                        stable=True)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    rect = proj.tile_rect[order]
    cols = colors[order]
    opac = opacity[order] * (proj.radius[order] > 0)

    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(mean2d.dtype)   # (P,)
    py = ys.reshape(-1).astype(mean2d.dtype)
    ptx = (xs // TILE).reshape(-1)
    pty = (ys // TILE).reshape(-1)

    dx = mean2d[:, 0:1] - px[None, :]          # (N, P)
    dy = mean2d[:, 1:2] - py[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opac[:, None] * jnp.exp(power))

    in_rect = ((ptx[None, :] >= rect[:, 0:1]) & (ptx[None, :] < rect[:, 2:3])
               & (pty[None, :] >= rect[:, 1:2]) & (pty[None, :] < rect[:, 3:4]))
    composable = in_rect & (power <= 0) & (alpha >= ALPHA_MIN)
    abar = jnp.where(composable, alpha, 0.0)

    weights, T_final = composite_order_weights(abar)
    image = jnp.einsum("np,nc->cp", weights, cols,
                       precision=jax.lax.Precision.HIGHEST)
    image = image + T_final[None, :] * bg[:, None]
    return {
        "image": image.reshape(nch, height, width),
        "final_T": T_final.reshape(height, width),
    }
