"""Gauss-Newton flow-PnP pose solve (tracking initialization).

Net-new quality lever over the reference. The reference tracks each frame
with 50 first-order Adam steps on ``1.0*rgb + 0.1*flow``
(``train.py:154-210``, ``scene/pose_optimizer.py:164-218``); Adam's
sign-scaled steps stall far from the optimum of that objective — the
round-4 full-scale attribution measured a per-frame translation error of
~79% of the true motion (BASELINE.md), which uniformly blurs the map and
caps reconstruction quality.

But the flow term is not a generic loss: previous-frame pixels
back-projected through the cached rendered depth give 3D points ``X_i``,
and ``pixel + flow`` gives their observed projections ``y_i`` in the
current frame. Minimizing ``sum_i w_i ||project(T X_i) - y_i||^2`` over
the 6-DoF pose ``T`` is a classical dense PnP / motion-only
bundle-adjustment problem with an analytic 2x6 Jacobian per point —
solvable to the flow/depth noise floor by a few Gauss-Newton iterations.
This module provides that solve; ``tracking_loop`` uses it to initialize
the pose before the reference's photometric Adam refinement (knob
``TrainConfig.tracking_gn_iters``; 0 restores exact reference semantics).

Everything is static-shape jnp: invalid pixels carry zero weight instead
of being gathered, the per-point Jacobian contractions are einsum
(MXU-friendly (HW,6)x(HW,6) reductions), and the 6x6 normal-equation
solve is a Cholesky on-core. Robustness: Huber reweighting (IRLS) with a
pixel-scale knee plus the tracking rigidity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera, backproject, pixel_grid
from ..core.transforms import (invert_se3, quat_normalize, quat_to_rotmat,
                               rotmat_to_quat, skew)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential of an (3,) axis-angle vector, jit-safe at 0.

    Taylor fallbacks below theta^2 ~ 1e-8 keep the map and its gradient
    finite at omega == 0 (the converged fixed point of the GN loop).
    """
    theta2 = jnp.sum(omega * omega)
    use_taylor = theta2 < 1e-8
    # Both where-branches are differentiated: the trig branch must see a
    # SAFE argument at theta == 0 or its 0/0 cotangent poisons the where.
    theta2_safe = jnp.where(use_taylor, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    K = skew(omega)
    return jnp.eye(3, dtype=omega.dtype) + a * K + b * (K @ K)


def flow_pnp_refine(quat0, trans0, prev_depth, prev_w2c, flow_fw, cam: Camera,
                    rigid_mask=None, iters: int = 8, huber_px: float = 2.0,
                    damping: float = 1e-4, edge: int = 20,
                    min_weight: float = 64.0):
    """Refine a w2c pose (quat, trans) by dense flow-PnP Gauss-Newton.

    prev_depth (H, W): frame t-1 rendered-depth cache (constant).
    prev_w2c (4, 4): frame t-1 pose (constant).
    flow_fw (2, H, W): precomputed forward flow t-1 -> t.
    rigid_mask (H, W) or None: pixels allowed to vote (Sampson mask).

    Returns (quat, trans, diag) where diag = [mean |residual| px over
    final weights, effective point weight]. If the effective weight ever
    drops below ``min_weight`` the step is zeroed (degenerate frame:
    keep the initialization rather than a garbage solve).
    """
    H, W = cam.height, cam.width
    depth = prev_depth.astype(jnp.float32)
    pts_world = backproject(depth, cam, invert_se3(prev_w2c))    # (HW, 3)
    xg, yg = pixel_grid(H, W)
    pix = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    target = pix + jnp.stack([flow_fw[0].reshape(-1),
                              flow_fw[1].reshape(-1)], axis=1)   # (HW, 2)
    base_valid = (depth.reshape(-1) > 0)
    if rigid_mask is not None:
        base_valid = base_valid & (rigid_mask.reshape(-1) > 0)
    base_valid = (base_valid
                  & (target[:, 0] > edge) & (target[:, 0] < W - edge)
                  & (target[:, 1] > edge) & (target[:, 1] < H - edge))

    R0 = quat_to_rotmat(quat_normalize(quat0))
    t0 = trans0

    def body(_, carry):
        R, t, _, _ = carry
        p = pts_world @ R.T + t                                  # (HW, 3)
        z = p[:, 2]
        valid = base_valid & (z > 1e-3)
        zs = jnp.where(valid, z, 1.0)
        a = p[:, 0] / zs
        b = p[:, 1] / zs
        u = a * cam.fx + cam.cx
        v = b * cam.fy + cam.cy
        r = jnp.stack([u, v], 1) - target                        # (HW, 2)
        rn = jnp.sqrt(jnp.sum(r * r, axis=1) + 1e-12)
        # Huber IRLS weight: quadratic inside the knee, linear outside.
        w = jnp.where(valid,
                      jnp.minimum(1.0, huber_px / jnp.maximum(rn, 1e-12)),
                      0.0)
        fxz = cam.fx / zs
        fyz = cam.fy / zs
        zero = jnp.zeros_like(zs)
        # 2x6 image Jacobian wrt the LEFT-multiplied twist (nu, omega):
        # p' = p + omega x p + nu. Columns: d(u,v)/d(nu), d(u,v)/d(omega).
        Ju = jnp.stack([fxz, zero, -fxz * a,
                        -cam.fx * a * b, cam.fx * (1.0 + a * a),
                        -cam.fx * b], axis=1)                    # (HW, 6)
        Jv = jnp.stack([zero, fyz, -fyz * b,
                        -cam.fy * (1.0 + b * b), cam.fy * a * b,
                        cam.fy * a], axis=1)
        Hm = (jnp.einsum("ni,n,nj->ij", Ju, w, Ju,
                         precision=jax.lax.Precision.HIGHEST)
              + jnp.einsum("ni,n,nj->ij", Jv, w, Jv,
                           precision=jax.lax.Precision.HIGHEST))
        g = (Ju.T @ (w * r[:, 0]) + Jv.T @ (w * r[:, 1]))
        n_eff = jnp.sum(w)
        # Levenberg damping scaled to the diagonal keeps the solve sane
        # when the mask is thin or the depth is near-planar.
        Hm = Hm + damping * jnp.diag(jnp.diag(Hm)) + 1e-8 * jnp.eye(6)
        delta = -jnp.linalg.solve(Hm, g)
        delta = jnp.where(n_eff >= min_weight, delta, jnp.zeros(6))
        Rd = so3_exp(delta[3:])
        R_new = Rd @ R
        t_new = Rd @ t + delta[:3]
        mean_r = jnp.sum(w * rn) / jnp.maximum(n_eff, 1e-6)
        return R_new, t_new, mean_r, n_eff

    R, t, mean_r, n_eff = jax.lax.fori_loop(
        0, iters, body, (R0, t0, jnp.float32(0.0), jnp.float32(0.0)))
    return rotmat_to_quat(R), t, jnp.stack([mean_r, n_eff])
