"""Per-Gaussian projection stage: frustum cull, EWA splat, tile extent.

This is the differentiable front half of the rasterizer (the CUDA
``preprocess`` kernel of diff-gaussian-rasterization, reimplemented as pure
jnp so XLA fuses it and `jax.grad` differentiates it for free — including
SE(3) pose gradients through the world->camera transform, the pattern the
reference relies on at ``scene/pose_optimizer.py:960-989`` /
``SURVEY.md §1``).

Numerical parity constants with the CUDA kernel (upstream forward.cu):
- covariance dilation: +0.3 on both diagonal entries of cov2D
- screen radius: ceil(3 * sqrt(lambda_max)), lambda via mid +/- sqrt(max(0.1, ...))
- near cull: camera-frame z <= 0.2 (hard-coded in the kernel, NOT znear)
- pixel mapping: pix = f * x/z + c - 0.5  (the composition of the
  reference's OpenGL projection matrix with ndc2Pix)
- EWA Jacobian evaluated at x/z clamped to +/-1.3 * tan(fov)

Reference-parity quirk, kept deliberately: the reference rasterizes with
``viewmatrix = I`` and pre-transformed means, so Gaussian covariances are
NOT rotated into the camera frame (only means are). ``rotate_cov=False``
reproduces this; set True for the geometrically-correct variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.camera import Camera
from ..core.transforms import quat_to_rotmat

TILE = 16  # pixels per tile side; 16x16 = 256 px = 2 f32 VPU lanes rows


class ProjectedGaussians(NamedTuple):
    """Output of the per-Gaussian stage, input to binning + compositing.

    All arrays have leading dim N (the static Gaussian capacity).
    """

    mean2d: jnp.ndarray      # (N, 2) pixel coords
    conic: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c)
    depth: jnp.ndarray       # (N,)  camera-frame z
    radius: jnp.ndarray      # (N,)  int32 screen radius in px (0 = culled)
    tile_rect: jnp.ndarray   # (N, 4) int32 (tx0, ty0, tx1, ty1), half-open
    tiles_touched: jnp.ndarray  # (N,) int32


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T from per-Gaussian log-free scales and quats.

    Mirrors ``build_scaling_rotation`` + ``strip_symmetric``
    (``utils/general_utils.py:227-236``) but keeps the full 3x3.
    """
    R = quat_to_rotmat(quats)                       # (N, 3, 3)
    M = R * scales[:, None, :]                      # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def ewa_cov2d(mean_cam: jnp.ndarray, cov3d: jnp.ndarray, cam: Camera,
              w2c_rot: jnp.ndarray | None = None) -> jnp.ndarray:
    """EWA projection of the 3D covariance to a 2x2 screen covariance.

    Returns (N, 3) packed symmetric (a, b, c) with the CUDA +0.3 dilation.
    """
    x, y, z = mean_cam[:, 0], mean_cam[:, 1], mean_cam[:, 2]
    z = jnp.where(z == 0, 1e-6, z)
    limx = 1.3 * cam.tan_fov_x
    limy = 1.3 * cam.tan_fov_y
    txtz = jnp.clip(x / z, -limx, limx)
    tytz = jnp.clip(y / z, -limy, limy)
    xc = txtz * z
    yc = tytz * z

    # J rows: d(pix)/d(cam point), evaluated at the clamped point.
    j00 = cam.fx / z
    j02 = -cam.fx * xc / (z * z)
    j11 = cam.fy / z
    j12 = -cam.fy * yc / (z * z)

    if w2c_rot is not None:
        # Rotate the world-frame covariance into camera frame first.
        cov3d = w2c_rot @ cov3d @ w2c_rot.T

    # cov2d = J Sigma J^T with J = [[j00, 0, j02], [0, j11, j12]]
    s00, s01, s02 = cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2]
    s11, s12, s22 = cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]
    # rows of J @ Sigma
    a0 = j00 * s00 + j02 * s02
    a1 = j00 * s01 + j02 * s12
    a2 = j00 * s02 + j02 * s22
    b1 = j11 * s11 + j12 * s12
    b2 = j11 * s12 + j12 * s22
    c_a = a0 * j00 + a2 * j02 + 0.3
    c_b = a1 * j11 + a2 * j12
    c_c = b1 * j11 + b2 * j12 + 0.3
    return jnp.stack([c_a, c_b, c_c], axis=-1)


def project_gaussians(mean_cam: jnp.ndarray, scales: jnp.ndarray,
                      quats: jnp.ndarray, cam: Camera,
                      active: jnp.ndarray | None = None,
                      w2c_rot: jnp.ndarray | None = None,
                      ) -> ProjectedGaussians:
    """Full per-Gaussian stage on camera-frame means.

    ``active`` masks out unused capacity slots (they project to radius 0).
    """
    n = mean_cam.shape[0]
    x, y, z = mean_cam[:, 0], mean_cam[:, 1], mean_cam[:, 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)

    px = cam.fx * x / zsafe + cam.cx - 0.5
    py = cam.fy * y / zsafe + cam.cy - 0.5
    mean2d = jnp.stack([px, py], axis=-1)

    cov3d = build_cov3d(scales, quats)
    cov2d = ewa_cov2d(mean_cam, cov3d, cam, w2c_rot)
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_safe = jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    visible = z > cam.near_cull
    visible &= det > 0
    if active is not None:
        visible &= active

    grid_x = -(-cam.width // TILE)
    grid_y = -(-cam.height // TILE)
    # CUDA getRect: min = clamp((p - r) / T), max = clamp((p + r + T - 1) / T)
    r = radius_f
    tx0 = jnp.clip(((px - r) / TILE).astype(jnp.int32), 0, grid_x)
    ty0 = jnp.clip(((py - r) / TILE).astype(jnp.int32), 0, grid_y)
    tx1 = jnp.clip(((px + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ty1 = jnp.clip(((py + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    tiles = (tx1 - tx0) * (ty1 - ty0)
    visible &= tiles > 0

    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(visible, tiles, 0).astype(jnp.int32)
    tile_rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1).astype(jnp.int32)
    # Zero the rect for culled gaussians so downstream expansion is clean.
    tile_rect = jnp.where(visible[:, None], tile_rect,
                          jnp.zeros((n, 4), jnp.int32))
    return ProjectedGaussians(mean2d=mean2d, conic=conic, depth=z,
                              radius=radius, tile_rect=tile_rect,
                              tiles_touched=tiles_touched)
