"""High-level differentiable renderer.

TPU-native equivalent of the reference's ``render()``
(``gaussian_renderer/__init__.py:49-92``), with the same outputs, but:

- ONE fused rasterizer pass produces color + depth + silhouette + depth^2
  (the reference runs the CUDA rasterizer twice per render);
- the world->camera transform is inside the traced function, so
  ``jax.grad`` delivers SE(3) pose gradients with no special casing
  (``gs_grad`` / ``cam_grad`` become ``stop_gradient`` choices);
- densification's view-space gradient statistics come from a zero-valued
  ``probe2d`` parameter added to the projected means — its cotangent IS
  the screen-space gradient the reference harvests from the ``means2D``
  dummy tensor (``gaussian_renderer/__init__.py:56-58``).

Reference-parity quirks kept:
- SH view directions use the frame-0 camera center (the origin), i.e.
  ``dirs = normalize(world_means)`` — reference ``setup_camera`` computes
  ``campos`` from the identity pose (``scene/pose_optimizer.py:603``).
- Background is white ([1, 1, 1]) and is composited into ALL channels,
  including the depth/silhouette/depth^2 auxiliaries, because the reference
  reuses the same raster settings (bg=1) for its depth pass — so
  depth += T, silhouette += T, depth_sq += T.
- Gaussian covariances are not rotated into the camera frame (see
  ``ops/projection.py``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.sh import sh_to_rgb_clamped
from ..core.transforms import transform_points
from .oracle import rasterize_oracle
from .projection import TILE, project_gaussians
from .raster_pallas import BinState, RasterConfig, compute_bin_state, \
    rasterize_pallas


def default_impl() -> str:
    """'pallas' on TPU, 'pallas-interpret' elsewhere (tests/CPU)."""
    return "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"


def raster_config(cam: Camera, max_instances: int, n: int,
                  impl: str | None = None, bin_tile: int = 32
                  ) -> RasterConfig:
    """The RasterConfig ``render`` will use for these arguments (public so
    training loops can build matching BinState loop carries)."""
    impl = impl or default_impl()
    mi = max_instances if max_instances > 0 else max(8 * n, 1024)
    mi = -(-mi // 128) * 128
    return RasterConfig(height=cam.height, width=cam.width,
                        max_instances=mi,
                        interpret=(impl == "pallas_interpret"),
                        bin_tile=bin_tile)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "sh_degree", "impl", "max_instances",
                     "gs_grad", "cam_grad", "bin_tile"))
def render(means3d: jnp.ndarray, quats: jnp.ndarray, log_scales: jnp.ndarray,
           logit_opacity: jnp.ndarray, sh_coeffs: jnp.ndarray,
           w2c: jnp.ndarray, cam: Camera, *,
           active: jnp.ndarray | None = None,
           probe2d: jnp.ndarray | None = None,
           sh_degree: int = 0,
           bg: jnp.ndarray | None = None,
           impl: str | None = None,
           max_instances: int = 0,
           gs_grad: bool = True,
           cam_grad: bool = True,
           bin_tile: int = 32,
           bins: BinState | None = None,
           rebin: jnp.ndarray | None = None) -> dict[str, Any]:
    """Render a view of the Gaussian field.

    Args:
      means3d: (N, 3) world-frame centers.
      quats: (N, 4) unnormalized rotations (w, x, y, z).
      log_scales: (N, 3) log scales.
      logit_opacity: (N,) pre-sigmoid opacities.
      sh_coeffs: (N, K, 3) SH coefficients (K >= (sh_degree+1)^2).
      w2c: (4, 4) world->camera.
      cam: static camera.
      active: (N,) bool capacity mask.
      probe2d: (N, 2) zero probe added to projected means (for densify stats).
      bg: (3,) background color, default white (reference parity).
      impl: 'pallas' | 'pallas_interpret' | 'oracle' (None -> auto).
      max_instances: instance-buffer capacity for the tile binner
        (0 -> heuristic 8*N rounded up).
      gs_grad / cam_grad: stop-gradient switches matching the reference's
        tracking (cam only) vs mapping (gaussians only) modes.
      bin_tile: instance-binning granularity in pixels (16 or 32). 32 bins
        coarser and masks per pixel with the 16px rect inside the kernel —
        bit-identical output with 2-3x fewer duplicated instances (the
        actual TPU bottleneck); 16 matches the CUDA binning literally.
      bins: optional binning-layout carry for cross-iteration amortization
        (see raster_pallas.BinState for the exactness contract). When
        given, ``rebin`` (a traced bool) selects between binning fresh
        this call and reusing ``bins``; the state actually used is
        returned under the "bins" key for the caller to carry.

    Returns dict with keys: render (3,H,W), render_dep (H,W), render_sil,
      uncertainty, final_T, radii, visibility, render_w2c, overflow
      (+ bins when a bins carry was passed).
    """
    impl = impl or default_impl()
    n = means3d.shape[0]
    if bg is None:
        bg = jnp.ones(3, means3d.dtype)

    gs = (lambda x: x) if gs_grad else jax.lax.stop_gradient
    cg = (lambda x: x) if cam_grad else jax.lax.stop_gradient

    w2c_used = cg(w2c)
    means_w = gs(means3d)
    mean_cam = transform_points(w2c_used, means_w)
    opacity = jax.nn.sigmoid(gs(logit_opacity))
    scales = jnp.exp(gs(log_scales))
    quats_used = gs(quats)

    proj = project_gaussians(mean_cam, scales, quats_used, cam, active=active)
    mean2d = proj.mean2d if probe2d is None else proj.mean2d + probe2d
    proj = proj._replace(mean2d=mean2d)

    # SH -> RGB against the frame-0 camera center (origin): reference parity.
    # rsqrt(max(|x|^2, eps^2)) — NOT x / max(norm(x), eps): norm's sqrt has
    # an infinite derivative at 0, and every never-used capacity slot holds
    # EXACTLY zero means, so the naive form emits 0 * inf = NaN cotangents
    # for (capacity - active) slots per backward (harmless to training —
    # the NaN guard zeroes them — but it saturates the nonfinite-grad
    # diagnostic that exists to catch REAL numerical trouble). Here the
    # max routes the zero-branch gradient to the constant before the
    # rsqrt, so the cotangent is exactly 0.
    n2 = jnp.sum(means_w * means_w, axis=-1, keepdims=True)
    dirs = means_w * jax.lax.rsqrt(jnp.maximum(n2, 1e-16))
    rgb = sh_to_rgb_clamped(sh_degree, gs(sh_coeffs), dirs)

    z = proj.depth
    bg6 = jnp.concatenate([bg, jnp.ones(3, bg.dtype)])  # z, sil, z^2 bg = 1

    if impl == "oracle":
        colors6 = jnp.concatenate(
            [rgb, z[:, None], jnp.ones((n, 1), z.dtype),
             (z * z)[:, None]], axis=1)
        out = rasterize_oracle(proj, colors6, opacity, cam.height, cam.width,
                               bg6)
        image6 = out["image"]
        final_T = out["final_T"]
        overflow = jnp.int32(0)
    else:
        cfg = raster_config(cam, max_instances, n, impl, bin_tile)
        rgbz = jnp.concatenate([rgb, z[:, None]], axis=1)
        if bins is not None:
            assert rebin is not None, "bins carry requires a rebin flag"
            bins = jax.lax.cond(
                rebin,
                lambda b: compute_bin_state(proj, opacity, cfg),
                lambda b: b, bins)
        out = rasterize_pallas(proj, rgbz, opacity, cfg, bins=bins)
        final_T = out["final_T"]
        image6 = out["image"] + final_T[None] * bg6[:, None, None]
        overflow = out["overflow"]
        bins_used = out["bins"]

    depth = image6[3]
    sil = image6[4]
    depth_sq = image6[5]
    uncertainty = jax.lax.stop_gradient(depth_sq - depth * depth)
    extra = {}
    if bins is not None:
        assert impl != "oracle", "bins carry unsupported for oracle impl"
        extra["bins"] = bins_used
    return {
        **extra,
        "render": image6[0:3],
        "render_dep": depth,
        "render_sil": sil,
        "presence_mask": sil > 0.3,
        "uncertainty": uncertainty,
        "final_T": final_T,
        "render_w2c": w2c_used,
        "radii": proj.radius,
        "visibility": proj.radius > 0,
        "overflow": overflow,
    }


def grid_dims(cam: Camera) -> tuple[int, int]:
    return -(-cam.width // TILE), -(-cam.height // TILE)
