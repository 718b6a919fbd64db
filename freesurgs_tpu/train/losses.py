"""Training losses (pure jnp, static shapes, jit/grad-safe).

Mirrors the reference's live loss surface:
- rgb_loss: 0.8 L1 + 0.2 (1 - SSIM), optional multiplicative mask
  (``utils/loss_utils.py:47-54``)
- pearson / local-pearson monocular-depth regularizers
  (``utils/loss_utils.py:98-127``; weights 0.05 / 0.15 at ``train.py:258``)
- flow-reprojection loss for tracking (``projection_flow_loss``,
  ``scene/pose_optimizer.py:164-218``), recast with static-shape validity
  masking instead of boolean indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera, backproject, pixel_grid, project
from ..core.transforms import invert_se3, transform_points
from ..ops.ssim import ssim


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def rgb_loss(img, gt, mask=None, lambda_dssim: float = 0.2):
    """(C, H, W) photometric loss. The mask multiplies both images
    (reference semantics — the L1/SSIM means stay over ALL pixels)."""
    if mask is not None:
        m = mask.astype(img.dtype)
        if m.ndim == 2:
            m = m[None]
        img = img * m
        gt = gt * m
    return (1.0 - lambda_dssim) * l1(img, gt) + lambda_dssim * (
        1.0 - ssim(img, gt))


def pearson_depth_loss(src, target, eps: float = 1e-6):
    """1 - Pearson correlation of two depth maps (any matching shape).

    The reference divides by ``std() + 1e-6`` (utils/loss_utils.py:104-105)
    whose GRADIENT is NaN at zero variance (d std = (x-mu)/(N*std) is 0/0
    for a constant map) — it never sees constant patches on real SCARED
    frames, but a textureless view or an all-background render is enough
    to poison every parameter through Adam. The smooth equivalent
    ``x / sqrt(var + eps^2)`` matches to ~1e-5 relative on real inputs
    and has a finite (zero) gradient at constant maps.
    """
    s = src - jnp.mean(src)
    t = target - jnp.mean(target)
    vs = jnp.mean(s * s)
    vt = jnp.mean(t * t)
    co = jnp.mean(s * t) * jax.lax.rsqrt((vs + eps * eps) * (vt + eps * eps))
    return 1.0 - co


def local_pearson_loss(src, target, key, box: int = 128,
                       p_corr: float = 0.5):
    """Mean pearson-depth loss over random boxes (reference
    ``local_pearson_loss``, ``utils/loss_utils.py:112-127``).

    src/target: (H, W). Number of boxes = p_corr * (H//box) * (W//box),
    a static quantity; box corners are uniform over the valid range.
    """
    h, w = src.shape
    box = min(box, h, w)  # small images: shrink the box (the reference
    # would sample zero boxes and divide by zero)
    n_boxes = max(int(p_corr * (h // box) * (w // box)), 1)
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_boxes,), 0, max(h - box, 1))
    y0 = jax.random.randint(ky, (n_boxes,), 0, max(w - box, 1))

    def one(x, y):
        s = jax.lax.dynamic_slice(src, (x, y), (box, box))
        t = jax.lax.dynamic_slice(target, (x, y), (box, box))
        return pearson_depth_loss(s, t)

    return jnp.mean(jax.vmap(one)(x0, y0))


def flow_projection_loss(prev_depth, prev_w2c, cur_w2c, gt_flow_fw,
                         cam: Camera, rigid_mask=None, edge: int = 20):
    """Tracking flow loss: reproject the previous frame's rendered depth
    through (prev pose)^-1 then the CURRENT learned pose, and compare the
    induced flow to the precomputed forward flow.

    prev_depth: (H, W) — cached rendered depth of frame t-1 (constant).
    cur_w2c: (4, 4) — differentiable (the tracked pose).
    gt_flow_fw: (2, H, W) forward flow t-1 -> t.
    Returns a masked mean matching the reference's l1 over selected pixels
    (mean over N points x 2 flow components).
    """
    H, W = cam.height, cam.width
    depth_mask = prev_depth > 0
    if rigid_mask is not None:
        depth_mask = depth_mask & (rigid_mask > 0)

    c2w_prev = invert_se3(prev_w2c)
    pts_world = backproject(prev_depth, cam, c2w_prev)      # (H*W, 3)
    pts_cur = transform_points(cur_w2c, pts_world)
    proj, z = project(pts_cur, cam)                          # (H*W, 2), (H*W,)

    xg, yg = pixel_grid(H, W)
    pix = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    induced = proj - pix                                     # (H*W, 2)
    gt = jnp.stack([gt_flow_fw[0].reshape(-1),
                    gt_flow_fw[1].reshape(-1)], axis=1)

    valid = (depth_mask.reshape(-1)
             & (proj[:, 0] > edge) & (proj[:, 0] < W - edge)
             & (proj[:, 1] > edge) & (proj[:, 1] < H - edge)
             & (z > 0))
    vf = valid.astype(induced.dtype)[:, None]
    # select-before-multiply: invalid pixels can project to +/-inf (z near
    # the division epsilon), and inf * 0 would poison the sum with NaN
    diff = jnp.where(vf > 0, induced - gt, 0.0)
    num = jnp.sum(jnp.abs(diff))
    den = 2.0 * jnp.sum(vf) + 1e-8
    loss = num / den
    return jnp.where(jnp.sum(vf) > 0, loss, 0.0)


# -------------------------------------------------------------------------
# MiDaS-style scale-and-shift-invariant depth loss (reference
# ``ScaleAndShiftInvariantLoss`` + ``compute_scale_and_shift`` +
# ``GradientLoss``, utils/loss_utils.py:138-262 — instantiated by the
# reference trainer at train.py:104-105; available here for depth
# supervision variants).

def compute_scale_and_shift(prediction, target, mask):
    """Closed-form least-squares (scale, shift) with target ~ s*pred + t
    over masked pixels. Shapes (B, H, W); returns (B,), (B,)."""
    a00 = jnp.sum(mask * prediction * prediction, (1, 2))
    a01 = jnp.sum(mask * prediction, (1, 2))
    a11 = jnp.sum(mask, (1, 2))
    b0 = jnp.sum(mask * prediction * target, (1, 2))
    b1 = jnp.sum(mask * target, (1, 2))
    det = a00 * a11 - a01 * a01
    ok = det != 0
    det_safe = jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (a11 * b0 - a01 * b1) / det_safe, 0.0)
    t = jnp.where(ok, (-a01 * b0 + a00 * b1) / det_safe, 0.0)
    return s, t


def _masked_gradient_loss(diff, mask):
    gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (
        mask[:, :, 1:] * mask[:, :, :-1])
    gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (
        mask[:, 1:, :] * mask[:, :-1, :])
    num = jnp.sum(gx, (1, 2)) + jnp.sum(gy, (1, 2))
    return num


def scale_shift_invariant_loss(prediction, target, mask, scales: int = 4):
    """Multi-scale gradient-matching loss on the scale/shift-aligned
    prediction (alpha=1 configuration, the reference default where the
    gradient term replaces the data term)."""
    s, t = compute_scale_and_shift(prediction, target, mask)
    pred = s[:, None, None] * prediction + t[:, None, None]
    total = 0.0
    denom = 0.0
    for sc in range(scales):
        step = 2 ** sc
        d = (pred - target)[:, ::step, ::step] * mask[:, ::step, ::step]
        total = total + jnp.sum(_masked_gradient_loss(
            d, mask[:, ::step, ::step]))
        denom = denom + jnp.sum(mask[:, ::step, ::step])
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)
