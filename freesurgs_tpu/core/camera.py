"""Pinhole camera model for the TPU rasterizer.

The reference drives the CUDA rasterizer through an OpenGL-style projection
matrix assembled from intrinsics (``scene/pose_optimizer.py:600-633``,
``setup_camera``). Composing that matrix with the NDC->pixel mapping used by
the CUDA kernel reduces exactly to ``pix_x = fx*x/z + cx - 0.5`` (and
likewise for y), so the TPU-native design parameterizes projection directly
with (fx, fy, cx, cy) — fewer matmuls, identical pixels.

``Camera`` is a static (hashable) dataclass so it can be a jit static arg.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def focal2fov(focal: float, pixels: int) -> float:
    """Reference: ``utils/graphics_utils.py:128-132``."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov * 0.5))


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static pinhole camera description (a jit-static argument).

    ``height``/``width`` are the true image dims; the rasterizer internally
    pads to tile multiples. ``near_cull`` mirrors the hard-coded z <= 0.2
    frustum cull inside the CUDA kernel (upstream ``forward.cu in_frustum``),
    independent of the znear used for the (vestigial) projection matrix.
    """

    height: int
    width: int
    fx: float
    fy: float
    cx: float
    cy: float
    znear: float = 0.01
    zfar: float = 100.0
    near_cull: float = 0.2

    @property
    def fov_x(self) -> float:
        return focal2fov(self.fx, self.width)

    @property
    def fov_y(self) -> float:
        return focal2fov(self.fy, self.height)

    @property
    def tan_fov_x(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fov_y(self) -> float:
        return self.height / (2.0 * self.fy)

    def intrinsic_matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32)

    @classmethod
    def from_K(cls, K, height: int, width: int, **kw) -> "Camera":
        K = np.asarray(K)
        return cls(height=int(height), width=int(width), fx=float(K[0, 0]),
                   fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
                   **kw)

    def scaled(self, height: int, width: int) -> "Camera":
        """Rescale intrinsics to a new resolution (reference rescales the
        1280x1024 SCARED calibration at ``scene/pose_optimizer.py:413-414``)."""
        sx = width / self.width
        sy = height / self.height
        return dataclasses.replace(
            self, height=height, width=width, fx=self.fx * sx,
            fy=self.fy * sy, cx=self.cx * sx, cy=self.cy * sy)


def opengl_projection_matrix(cam: Camera) -> np.ndarray:
    """The reference's intrinsics-based OpenGL projection
    (``scene/pose_optimizer.py:614-617``). Kept for parity tooling / viewer
    interop; the TPU render path does not use it.
    """
    w, h = cam.width, cam.height
    near, far = cam.znear, cam.zfar
    return np.array([
        [2 * cam.fx / w, 0.0, -(w - 2 * cam.cx) / w, 0.0],
        [0.0, 2 * cam.fy / h, -(h - 2 * cam.cy) / h, 0.0],
        [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
        [0.0, 0.0, 1.0, 0.0],
    ], dtype=np.float32)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(H, W) meshgrid of pixel x / y coordinates (pixel centers at integer
    coordinates, matching the CUDA kernel's ``pix = {x, y}`` convention)."""
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    return jnp.meshgrid(xs, ys, indexing="xy")


def backproject(depth: jnp.ndarray, cam: Camera, c2w: jnp.ndarray | None = None):
    """Back-project an (H, W) depth map to (H*W, 3) points.

    Mirrors ``utils/geometry_utils.py:276-331 get_pointcloud`` (note: that
    code uses integer pixel coords, i.e. xx = (u - cx)/fx with u = 0..W-1).
    If ``c2w`` is given, points are returned in world frame.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    xg, yg = pixel_grid(H, W, dtype=depth.dtype)
    z = depth.reshape(-1)
    x = (xg.reshape(-1) - cam.cx) / cam.fx * z
    y = (yg.reshape(-1) - cam.cy) / cam.fy * z
    pts = jnp.stack([x, y, z], axis=-1)
    if c2w is not None:
        pts = pts @ c2w[:3, :3].T + c2w[:3, 3]
    return pts


def project(pts_cam: jnp.ndarray, cam: Camera, eps: float = 1e-5):
    """Project (N, 3) camera-frame points -> (N, 2) pixel coords, plus depth.

    Uses the K @ p convention of the reference's flow-reprojection code
    (``scene/pose_optimizer.py:164-218``): pix = (fx x / z + cx, fy y / z + cy).
    """
    z = pts_cam[..., 2:3] + eps
    u = pts_cam[..., 0:1] / z * cam.fx + cam.cx
    v = pts_cam[..., 1:2] / z * cam.fy + cam.cy
    return jnp.concatenate([u, v], axis=-1), pts_cam[..., 2]
