"""Quaternion / SE(3) transform utilities (pure jnp, differentiable).

TPU-native equivalents of the reference pose math:
- quaternion -> rotation matrix (reference: ``utils/general_utils.py:204-225``
  ``build_rotation`` and ``scene/pose_optimizer.py:843-860`` ``LearnPose.q2rot``)
- world->camera matrix from (quat, t) (reference:
  ``scene/pose_optimizer.py:862-877`` ``getWorld2View2``)
- homogeneous point transforms (reference: ``scene/pose_optimizer.py:960-989``
  ``transform_to_frame``)

Quaternion convention: (w, x, y, z), unnormalized storage; normalize before
converting. All functions are shape-polymorphic over leading batch dims where
noted and safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 4) quaternion(s) (w, x, y, z) to (..., 3, 3) rotation(s).

    Normalizes internally, so gradients flow through the normalization —
    this matches the reference, which differentiates through
    ``F.normalize`` + the quat->R polynomial.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3, 3) rotation(s) to (..., 4) quaternion(s) (w, x, y, z).

    Branch-free Shepperd-style conversion (safe under jit). Returns unit
    quaternions with non-negative w.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four candidate constructions; pick the best-conditioned per element.
    qw = jnp.stack(
        [1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22,
         1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    # candidates[k] is the quaternion built by solving around component k
    c0 = jnp.stack([qw[..., 0],
                    (m21 - m12) / (4.0 * qw[..., 0]),
                    (m02 - m20) / (4.0 * qw[..., 0]),
                    (m10 - m01) / (4.0 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4.0 * qw[..., 1]),
                    qw[..., 1],
                    (m01 + m10) / (4.0 * qw[..., 1]),
                    (m02 + m20) / (4.0 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4.0 * qw[..., 2]),
                    (m01 + m10) / (4.0 * qw[..., 2]),
                    qw[..., 2],
                    (m12 + m21) / (4.0 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4.0 * qw[..., 3]),
                    (m02 + m20) / (4.0 * qw[..., 3]),
                    (m12 + m21) / (4.0 * qw[..., 3]),
                    qw[..., 3]], axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    q = quat_normalize(q)
    return jnp.where(q[..., :1] < 0, -q, q)


def build_w2c(quat: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 world->camera matrix from (..., 4) quat and (..., 3) t.

    Reference: ``LearnPose.getWorld2View2`` — Rt[:3,:3] = R(q), Rt[:3,3] = t.
    """
    R = quat_to_rotmat(quat)
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4, 4) homogeneous transform to (N, 3) points -> (N, 3).

    Differentiable both w.r.t. T and pts: this is the load-bearing op that
    routes SE(3) pose gradients around the rasterizer (reference
    ``transform_to_frame``, ``scene/pose_optimizer.py:960-989``).
    """
    return pts @ T[:3, :3].T + T[:3, 3]


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., :, None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype),
        T.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]x."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def relative_pose(w2c_1: jnp.ndarray, w2c_2: jnp.ndarray):
    """Relative (R, t) mapping camera-1 coordinates to camera-2 coordinates.

    x2 = R_rel x1 + t_rel for world point seen in both frames.
    """
    R1, t1 = w2c_1[:3, :3], w2c_1[:3, 3]
    R2, t2 = w2c_2[:3, :3], w2c_2[:3, 3]
    R_rel = R2 @ R1.T
    t_rel = t2 - R_rel @ t1
    return R_rel, t_rel


def essential_from_poses(w2c_1: jnp.ndarray, w2c_2: jnp.ndarray) -> jnp.ndarray:
    """Essential matrix E such that x2^T E x1 = 0 for normalized coords.

    Mirrors kornia's ``essential_from_Rt`` used at
    ``scene/pose_optimizer.py:640-648``: E = [t_rel]x @ R_rel.
    """
    R_rel, t_rel = relative_pose(w2c_1, w2c_2)
    return skew(t_rel) @ R_rel


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray,
                               K2: jnp.ndarray) -> jnp.ndarray:
    """F = K2^-T E K1^-1 (pixel-coordinate epipolar constraint)."""
    K1_inv = jnp.linalg.inv(K1)
    K2_inv = jnp.linalg.inv(K2)
    return K2_inv.T @ E @ K1_inv


def euler_degrees_to_rotmat(euler_xyz_deg: jnp.ndarray) -> jnp.ndarray:
    """XYZ-intrinsic Euler angles in degrees -> 3x3 rotation.

    Used by the viewer path (reference ``utils/geometry_utils.py:92-138``).
    """
    rx, ry, rz = jnp.deg2rad(euler_xyz_deg)
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
