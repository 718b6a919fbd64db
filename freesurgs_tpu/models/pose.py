"""PoseTable: per-frame learnable SE(3) camera poses as a pytree.

TPU-native redesign of the reference's ``LearnPose``
(``scene/pose_optimizer.py:755-877``): a table of per-frame unnormalized
quaternions (init (1,0,0,0)) and translations (init 0), converted to 4x4
world->camera matrices on demand. Frame 0 is pinned to identity by
convention (``train.py:41``).

Also hosts the pose-side algorithmic pieces:
- constant-velocity initialization (``initialize_pose``,
  ``scene/pose_optimizer.py:498-516``),
- fundamental matrix from two learned poses (``get_fundamental_matrix``,
  ``scene/pose_optimizer.py:640-648``, kornia-free),
- dense flow correspondences + Sampson epipolar distance map
  (``get_matches`` / ``compute_epipolar_loss``,
  ``scene/pose_optimizer.py:700-746``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.camera import Camera, pixel_grid
from ..core.transforms import (build_w2c, essential_from_poses,
                               fundamental_from_essential, quat_normalize)


class PoseTable(struct.PyTreeNode):
    quats: jnp.ndarray   # (T, 4) unnormalized (w, x, y, z)
    trans: jnp.ndarray   # (T, 3)

    @property
    def num_frames(self) -> int:
        return self.quats.shape[0]

    def w2c(self, t) -> jnp.ndarray:
        """4x4 world->camera of frame t (differentiable w.r.t. the table)."""
        return build_w2c(self.quats[t], self.trans[t])

    def all_w2c(self) -> jnp.ndarray:
        return build_w2c(self.quats, self.trans)

    def set_frame(self, t, quat, trans) -> "PoseTable":
        return self.replace(quats=self.quats.at[t].set(quat),
                            trans=self.trans.at[t].set(trans))


def identity_poses(num_frames: int) -> PoseTable:
    quats = jnp.zeros((num_frames, 4), jnp.float32).at[:, 0].set(1.0)
    return PoseTable(quats=quats, trans=jnp.zeros((num_frames, 3),
                                                  jnp.float32))


def const_velocity_init(poses: PoseTable, t) -> PoseTable:
    """Initialize frame t by extrapolating frames t-1, t-2.

    new_q = normalize(q1 + (q1 - q2)), new_t = t1 + (t1 - t2)
    (reference ``scene/pose_optimizer.py:501-512``). For t <= 1 the caller
    should copy frame t-1 instead.
    """
    q1 = quat_normalize(poses.quats[t - 1])
    q2 = quat_normalize(poses.quats[t - 2])
    new_q = quat_normalize(q1 + (q1 - q2))
    tr1 = poses.trans[t - 1]
    tr2 = poses.trans[t - 2]
    return poses.set_frame(t, new_q, tr1 + (tr1 - tr2))


def copy_previous_init(poses: PoseTable, t) -> PoseTable:
    return poses.set_frame(t, poses.quats[t - 1], poses.trans[t - 1])


def fundamental_matrix(poses: PoseTable, t1, t2, K: jnp.ndarray):
    E = essential_from_poses(poses.w2c(t1), poses.w2c(t2))
    return fundamental_from_essential(E, K, K)


def sampson_distance(F: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray,
                     eps: float = 1e-8) -> jnp.ndarray:
    """First-order epipolar (Sampson) distance for (N, 2) pixel matches.

    d = (x2^T F x1)^2 / ((Fx1)_x^2 + (Fx1)_y^2 + (F^T x2)_x^2 + (F^T x2)_y^2)
    — the same quantity kornia's ``sampson_epipolar_distance`` returns
    (used at ``scene/pose_optimizer.py:743``).
    """
    ones = jnp.ones_like(pts1[:, :1])
    x1 = jnp.concatenate([pts1, ones], axis=1)
    x2 = jnp.concatenate([pts2, ones], axis=1)
    Fx1 = x1 @ F.T          # (N, 3)
    Ftx2 = x2 @ F           # (N, 3)
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = (Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2
           + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2)
    return num / (den + eps)


def epipolar_rigidity(poses: PoseTable, t1, t2, flow_fw: jnp.ndarray,
                      cam: Camera, K: jnp.ndarray):
    """Dense Sampson distance map between frames t1 -> t2.

    flow_fw: (2, H, W) precomputed forward optical flow of frame t1.
    Returns (mean_distance, sampson_map (H, W)). Out-of-bounds flow targets
    get distance 0 (the reference's validity mask zeroes them out of the
    mask product downstream; the map itself is used via an adaptive
    threshold, so zeros are conservative-rigid, matching the reference's
    behavior of only masking by the thresholded map).
    """
    H, W = cam.height, cam.width
    xg, yg = pixel_grid(H, W)
    p1 = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    p2 = p1 + jnp.stack([flow_fw[0].reshape(-1), flow_fw[1].reshape(-1)],
                        axis=1)
    F = fundamental_matrix(poses, t1, t2, K)
    d = sampson_distance(F, p1, p2)
    in_bounds = ((p2[:, 0] > 0) & (p2[:, 0] < W)
                 & (p2[:, 1] > 0) & (p2[:, 1] < H))
    d = jnp.where(in_bounds, d, 0.0)
    return jnp.mean(d), d.reshape(H, W)


def adaptive_threshold_mask(x: jnp.ndarray, factor: float = 2.0):
    """mask = x <= mean + factor * std (reference
    ``utils/general_utils.py:96-116``)."""
    return x <= (jnp.mean(x) + factor * jnp.std(x))


def flow_matches(flow_fw: jnp.ndarray, cam: Camera):
    """Dense correspondences from precomputed forward flow
    (reference ``get_matches``, ``scene/pose_optimizer.py:700-730``).

    Returns (pts1 (H*W, 2), pts2 (H*W, 2), valid (H*W,)) with validity =
    flow target inside the image.
    """
    H, W = cam.height, cam.width
    xg, yg = pixel_grid(H, W)
    p1 = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    p2 = p1 + jnp.stack([flow_fw[0].reshape(-1),
                         flow_fw[1].reshape(-1)], axis=1)
    valid = ((p2[:, 0] > 0) & (p2[:, 0] < W)
             & (p2[:, 1] > 0) & (p2[:, 1] < H))
    return p1, p2, valid


def pnp_pose_init(poses: PoseTable, t: int, flow_fw_prev, prev_depth,
                  prev_w2c, cam: Camera, max_points: int = 4000,
                  seed: int = 0) -> PoseTable:
    """PnP-based initialization of frame t (the reference's
    ``initialize_pose(pnp=True)`` branch, ``scene/pose_optimizer.py:517-532``
    — which calls an undefined ``solve_pose_pnp`` in the reference; here it
    is implemented with RANSAC PnP on flow correspondences against the
    previous frame's rendered depth). Host-side (init-time only).
    """
    import numpy as np

    p1, p2, valid = flow_matches(flow_fw_prev, cam)
    p1, p2 = np.asarray(p1), np.asarray(p2)
    depth = np.asarray(prev_depth).reshape(-1)
    valid = np.asarray(valid) & (depth > 0)
    idx = np.flatnonzero(valid)
    rng = np.random.default_rng(seed)
    if len(idx) > max_points:
        idx = rng.choice(idx, max_points, replace=False)
    if len(idx) < 6:
        return copy_previous_init(poses, t)

    K = np.asarray(cam.intrinsic_matrix(), np.float64)
    # back-project frame t-1 pixels into ITS camera frame
    z = depth[idx]
    x = (p1[idx, 0] - cam.cx) / cam.fx * z
    y = (p1[idx, 1] - cam.cy) / cam.fy * z
    obj = np.stack([x, y, z], -1).astype(np.float64)
    img = p2[idx].astype(np.float64)

    try:
        import cv2
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            obj, img, K, None, flags=cv2.SOLVEPNP_ITERATIVE,
            reprojectionError=3.0)
        if not ok:
            return copy_previous_init(poses, t)
        R_rel, _ = cv2.Rodrigues(rvec)
        t_rel = tvec[:, 0]
    except ImportError:
        return copy_previous_init(poses, t)

    # rel maps cam(t-1) coords -> cam(t): w2c_t = rel @ w2c_{t-1}
    prev = np.asarray(prev_w2c, np.float64)
    rel = np.eye(4)
    rel[:3, :3], rel[:3, 3] = R_rel, t_rel
    new = rel @ prev
    from ..core.transforms import rotmat_to_quat
    q = rotmat_to_quat(jnp.asarray(new[:3, :3], jnp.float32))
    return poses.set_frame(t, q, jnp.asarray(new[:3, 3], jnp.float32))
