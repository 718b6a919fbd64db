"""Flow warping and occlusion checking (pure jnp).

Equivalents of the reference's ``torch_warp`` (bilinear backward warp via
grid_sample, ``utils/geometry_utils.py:31-59``) and
``forward_backward_occ_check`` (``:61-90``), plus ``get_median_depth``
(``:263-274``). Differentiable; zero padding outside the image like
``grid_sample(padding_mode='zeros')``.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample (C, H, W) at float pixel coords x, y (any shape) with zero
    padding outside."""
    C, H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = img[:, yi, xi]
        return jnp.where(inside, v, 0.0)

    v = (tap(x0, y0) * (1 - wx) * (1 - wy)
         + tap(x0 + 1, y0) * wx * (1 - wy)
         + tap(x0, y0 + 1) * (1 - wx) * wy
         + tap(x0 + 1, y0 + 1) * wx * wy)
    return v


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp (C, H, W) image by (2, H, W) flow: out(p) = img(p + flow)."""
    _, H, W = img.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    return bilinear_sample(img, xs + flow[0], ys + flow[1])


def forward_backward_occlusion(flow_fw: jnp.ndarray, flow_bw: jnp.ndarray,
                               alpha1: float = 0.01, alpha2: float = 0.5):
    """Occlusion mask from forward/backward flow consistency.

    A pixel is non-occluded when |fw + warp(bw, fw)|^2 <
    alpha1 * (|fw|^2 + |warp(bw)|^2) + alpha2 (the standard UnFlow-style
    check the reference implements). Returns (H, W) bool, True = consistent.
    """
    bw_at_fw = flow_warp(flow_bw, flow_fw)
    diff = flow_fw + bw_at_fw
    mag = (jnp.sum(flow_fw ** 2, 0) + jnp.sum(bw_at_fw ** 2, 0))
    return jnp.sum(diff ** 2, 0) < alpha1 * mag + alpha2


def median_depth(depth: jnp.ndarray, opacity: jnp.ndarray | None = None,
                 mask: jnp.ndarray | None = None,
                 opacity_thresh: float = 0.95):
    """Median of valid depths (reference ``get_median_depth``), static-shape
    via sorting with invalid values pushed to +inf."""
    valid = depth > 0
    if opacity is not None:
        valid &= opacity > opacity_thresh
    if mask is not None:
        valid &= mask
    vals = jnp.where(valid, depth, jnp.inf).reshape(-1)
    srt = jnp.sort(vals)
    n = jnp.sum(valid)
    return srt[jnp.maximum(n // 2 - 1, 0)]
