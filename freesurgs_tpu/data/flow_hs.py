"""Dense optical flow: multi-scale Horn-Schunck with iterative warping.

Producer-side capability for onboarding RAW video into the SCARED input
layout the training pipeline consumes (``data/scared.py``; reference file
layout at ``scene/pose_optimizer.py:396-414``). The reference provides NO
flow producer — it assumes precomputed RAFT ``.npz`` files. This module
is a classical, dependency-free estimator (pure jnp, jit-compiled, runs
on CPU or TPU) so the full pipeline can run on raw frames today; for
RAFT-quality flow, plug any learned model into the same ``.npz``
interface (see ``scripts/produce_inputs.py``).

Algorithm: coarse-to-fine pyramid; at each level the current flow warps
the target frame (bilinear), a linearized Horn-Schunck system is solved
by Jacobi sweeps (4-neighbour smoothness), and the increment is composed.
All loops are ``lax.fori_loop`` / ``lax.scan`` over static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) [0,1] -> (H, W) luma."""
    r, g, b = img[0], img[1], img[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x box downsample of (H, W) with odd-size guard (crop to even)."""
    h, w = img.shape
    img = img[: h - h % 2, : w - w % 2]
    return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                   + img[0::2, 1::2] + img[1::2, 1::2])


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
              ) -> jnp.ndarray:
    """Sample (H, W) image at float coords (clamped to border)."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _neighbor_avg(f: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour average with edge replication (HS smoothness term)."""
    up = jnp.concatenate([f[:1], f[:-1]], axis=0)
    dn = jnp.concatenate([f[1:], f[-1:]], axis=0)
    lf = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    rt = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    return 0.25 * (up + dn + lf + rt)


def _hs_level(i0, i1, u, v, alpha, n_warps, n_jacobi):
    """One pyramid level: warp -> linearize -> Jacobi sweeps, repeated."""
    h, w = i0.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)

    def warp_iter(_, uv):
        u, v = uv
        i1w = _bilinear(i1, xx + u, yy + v)
        # centered gradients of the warped target (border-replicated)
        gx = 0.5 * (jnp.roll(i1w, -1, 1) - jnp.roll(i1w, 1, 1))
        gy = 0.5 * (jnp.roll(i1w, -1, 0) - jnp.roll(i1w, 1, 0))
        it = i1w - i0
        denom = alpha * alpha + gx * gx + gy * gy

        def jacobi(_, duv):
            du, dv = duv
            ubar = _neighbor_avg(u + du) - u
            vbar = _neighbor_avg(v + dv) - v
            t = (gx * ubar + gy * vbar + it) / denom
            return ubar - gx * t, vbar - gy * t

        du, dv = jax.lax.fori_loop(
            0, n_jacobi, jacobi, (jnp.zeros_like(u), jnp.zeros_like(v)))
        return u + du, v + dv

    return jax.lax.fori_loop(0, n_warps, warp_iter, (u, v))


def _upsample2_to(f: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Upsample flow field (H', W') -> (h, w), scaling magnitudes by 2."""
    hh, ww = f.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    sx = ww / w
    sy = hh / h
    return 2.0 * _bilinear(f, (xx + 0.5) * sx - 0.5, (yy + 0.5) * sy - 0.5)


@functools.partial(jax.jit, static_argnames=("levels", "n_warps",
                                             "n_jacobi"))
def hs_flow(img0: jnp.ndarray, img1: jnp.ndarray, levels: int = 5,
            alpha: float = 0.3, n_warps: int = 3, n_jacobi: int = 60
            ) -> jnp.ndarray:
    """Dense flow img0 -> img1. Inputs (3, H, W) in [0,1]; returns
    (2, H, W) float32 (dx, dy) in pixels — the RAFT 'pred' convention
    the loader expects (data/scared.py)."""
    g0 = _to_gray(img0)
    g1 = _to_gray(img1)
    pyr = [(g0, g1)]
    for _ in range(levels - 1):
        g0 = _downsample2(g0)
        g1 = _downsample2(g1)
        pyr.append((g0, g1))

    u = jnp.zeros_like(pyr[-1][0])
    v = jnp.zeros_like(pyr[-1][0])
    for (l0, l1) in reversed(pyr):
        h, w = l0.shape
        if u.shape != (h, w):
            u = _upsample2_to(u, h, w)
            v = _upsample2_to(v, h, w)
        u, v = _hs_level(l0, l1, u, v, jnp.float32(alpha), n_warps,
                         n_jacobi)
    return jnp.stack([u, v])


def parallax_disparity(flow_fw: jnp.ndarray, flow_bw: jnp.ndarray
                       ) -> jnp.ndarray:
    """Monocular structure proxy: median-compensated parallax magnitude.

    For translation-dominant video (endoscope sweeps), residual flow after
    removing the global median (a cheap stand-in for the rotational
    component) is proportional to inverse depth. The loader only consumes
    the RELATIVE structure — it min-max normalizes 1/disp into [0.5, 1.5]
    (data/scared.py, reference scene/pose_optimizer.py:406-407) — so any
    positive monotone disparity proxy produces a usable prior. Averaging
    |fw| with |bw| halves occlusion noise. Output (H, W) > 0 in the
    'pred' disparity convention of the monodep .npz files.
    """
    def residual(f):
        med = jnp.median(f.reshape(2, -1), axis=1)
        r = f - med[:, None, None]
        return jnp.sqrt(r[0] * r[0] + r[1] * r[1] + 1e-12)

    mag = 0.5 * (residual(flow_fw) + residual(flow_bw))
    # light smoothing: disparity priors are low-frequency
    for _ in range(2):
        mag = _neighbor_avg(mag)
    return mag + 1e-3 * jnp.max(mag)
