"""Mesh-sharded rendering and training steps.

Sharding layout (net-new design; the reference is single-GPU only):

- The per-Gaussian stage (world->camera transform, EWA projection, SH) is
  computed per device on the replicated parameter pytree — its cost is
  O(N * ~100 flops), two orders below compositing.
- The compositing stage is sharded over ROWS OF TILES along the mesh's
  ``tiles`` axis: each device shifts the projected means into its band's
  local pixel frame, clips tile rects to the band, bins and rasterizes
  only its own tiles, and emits its image band. ``shard_map`` concatenates
  bands into the full image.
- Backward: jax.grad through the shard_map gives each device the gradient
  contribution of its band; the replicated-parameter transpose inserts the
  cross-device psum (riding ICI), overlapped by XLA's scheduler.
- Multi-sequence data parallelism stacks a leading ``data`` mesh axis over
  frames (each data shard trains on its own view); parameter gradients are
  then additionally psum-med over ``data``.

The band height must divide the padded tile grid; ``pad_height_for`` gives
the padded camera.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.sh import sh_to_rgb_clamped
from ..core.transforms import transform_points
from ..ops.oracle import rasterize_oracle
from ..ops.projection import TILE, ProjectedGaussians, project_gaussians
from ..ops.raster_pallas import RasterConfig, rasterize_pallas
from .mesh import TILE_AXIS


def pad_height_for(cam: Camera, n_shards: int) -> Camera:
    """Pad image height so the tile-row grid divides evenly into bands."""
    grid_y = -(-cam.height // TILE)
    grid_y = -(-grid_y // n_shards) * n_shards
    return dataclasses.replace(cam, height=grid_y * TILE)


def render_sharded(mesh: Mesh, means3d, quats, log_scales, logit_opacity,
                   sh_coeffs, w2c, cam: Camera, *, active=None,
                   sh_degree: int = 0, impl: str = "oracle",
                   max_instances: int = 4096, bg=None):
    """Full-image render with tile-rows sharded over the mesh.

    Returns dict with render (3, Hpad, W), render_dep, render_sil, final_T.
    Output rows beyond the true cam.height are background. Differentiable
    w.r.t. all Gaussian params and the pose.
    """
    n_shards = mesh.shape[TILE_AXIS]
    pcam = pad_height_for(cam, n_shards)
    band_h = pcam.height // n_shards
    grid_ty_band = band_h // TILE
    # each band only bins its own instances: scale the slot capacity so
    # binning cost divides across the mesh like compositing does
    max_instances = max(-(-max_instances // n_shards // 128) * 128, 128)
    if bg is None:
        bg = jnp.ones(3, jnp.float32)
    bg6 = jnp.concatenate([bg, jnp.ones(3, bg.dtype)])

    def band(means3d, quats, log_scales, logit_opacity, sh_coeffs, w2c,
             active, bg6):
        b = jax.lax.axis_index(TILE_AXIS)
        mean_cam = transform_points(w2c, means3d)
        proj = project_gaussians(mean_cam, jnp.exp(log_scales), quats,
                                 pcam, active=active)
        # shift into the band's local pixel/tile frame
        y0 = (b * band_h).astype(jnp.float32)
        mean2d = proj.mean2d - jnp.stack(
            [jnp.zeros_like(y0), y0])[None, :]
        rect = proj.tile_rect
        ty0 = jnp.clip(rect[:, 1] - b * grid_ty_band, 0, grid_ty_band)
        ty1 = jnp.clip(rect[:, 3] - b * grid_ty_band, 0, grid_ty_band)
        rect = jnp.stack([rect[:, 0], ty0, rect[:, 2], ty1], axis=1)
        touched = (rect[:, 2] - rect[:, 0]) * (ty1 - ty0)
        in_band = touched > 0
        radius = jnp.where(in_band, proj.radius, 0)
        proj = proj._replace(mean2d=mean2d, tile_rect=rect,
                             tiles_touched=touched.astype(jnp.int32),
                             radius=radius)

        dirs = means3d / jnp.maximum(
            jnp.linalg.norm(means3d, axis=-1, keepdims=True), 1e-8)
        rgb = sh_to_rgb_clamped(sh_degree, sh_coeffs, dirs)
        z = proj.depth
        if impl == "oracle":
            colors6 = jnp.concatenate(
                [rgb, z[:, None], jnp.ones_like(z[:, None]),
                 (z * z)[:, None]], axis=1)
            out = rasterize_oracle(proj, colors6, jax.nn.sigmoid(
                logit_opacity), band_h, pcam.width, bg6)
            return out["image"], out["final_T"]
        cfg = RasterConfig(height=band_h, width=pcam.width,
                           max_instances=max_instances,
                           interpret=(impl == "pallas_interpret"))
        rgbz = jnp.concatenate([rgb, z[:, None]], axis=1)
        out = rasterize_pallas(proj, rgbz, jax.nn.sigmoid(logit_opacity),
                               cfg)
        image6 = out["image"] + out["final_T"][None] * bg6[:, None, None]
        return image6, out["final_T"]

    if active is None:
        active = jnp.ones(means3d.shape[0], bool)
    rep = P()
    # check_vma=False: with the varying-axes tracker enabled, the
    # transpose of this band function (axis_index-dependent masks + sorts
    # over replicated inputs) produces wrong parameter cotangents on
    # jax 0.9; with it disabled the replicated-input psum transpose is
    # correct (verified against the single-device renderer in
    # tests/test_sharded.py::test_sharded_gradients_match). Minimal
    # standalone repro: scripts/vma_repro.py (the argsort+gather over a
    # replicated operand is the trigger); version gate:
    # tests/test_vma_regression.py.
    image6, final_T = jax.shard_map(
        band, mesh=mesh,
        in_specs=(rep,) * 8,
        out_specs=(P(None, TILE_AXIS, None), P(TILE_AXIS, None)),
        check_vma=False,
    )(means3d, quats, log_scales, logit_opacity, sh_coeffs, w2c, active,
      bg6)
    return {"render": image6[0:3], "render_dep": image6[3],
            "render_sil": image6[4], "final_T": final_T,
            "pad_height": pcam.height}


def sharded_train_step(mesh: Mesh, params: dict, w2c, gt_image,
                       cam: Camera, *, sh_degree: int = 0,
                       impl: str = "oracle", max_instances: int = 4096,
                       lr: float = 1e-3):
    """One SGD step on the sharded renderer (the dry-run / scaling proof).

    gt_image: (3, Hpad, W) padded target. Returns (new_params, loss).
    Gradient math: loss reads the row-sharded image; its backward produces
    per-band parameter grads which the shard_map transpose psums across
    the mesh — the distributed all-reduce rides ICI without any explicit
    collective in user code.
    """

    def loss_fn(p):
        out = render_sharded(mesh, p["means"], p["quats"], p["log_scales"],
                             p["logit_opacity"], p["sh"], w2c, cam,
                             sh_degree=sh_degree, impl=impl,
                             max_instances=max_instances)
        return jnp.mean((out["render"] - gt_image) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda x, g: x - lr * g, params, grads)
    return new_params, loss


# N at which sharded projection pays off: below this, the per-gaussian
# stage (~100 flops + SH eval) is cheaper than the all_gather of the
# ~16-float compact records it saves (ICI latency dominated); above it,
# projection+SH divide across the mesh. See BASELINE.md scaling notes.
SHARD_PROJECTION_MIN_N = 1 << 18


def _clip_to_band(b, band_h, grid_ty_band, mean2d, rect, touched, radius):
    """Shift projected records into band ``b``'s local pixel/tile frame."""
    y0 = (b * band_h).astype(jnp.float32)
    mean2d = mean2d - jnp.stack([jnp.zeros_like(y0), y0])[None, :]
    ty0 = jnp.clip(rect[:, 1] - b * grid_ty_band, 0, grid_ty_band)
    ty1 = jnp.clip(rect[:, 3] - b * grid_ty_band, 0, grid_ty_band)
    rect = jnp.stack([rect[:, 0], ty0, rect[:, 2], ty1], axis=1)
    touched = ((rect[:, 2] - rect[:, 0]) * (ty1 - ty0)).astype(jnp.int32)
    radius = jnp.where(touched > 0, radius, 0)
    return mean2d, rect, touched, radius


def render_sharded_full(mesh: Mesh, means3d, quats, log_scales,
                        logit_opacity, sh_coeffs, w2c, cam: Camera, *,
                        active=None, probe2d=None, sh_degree: int = 0,
                        impl: str = "oracle", max_instances: int = 4096,
                        bg=None, gs_grad: bool = True,
                        cam_grad: bool = True,
                        shard_projection: bool | str = "auto"):
    """Band-sharded render with the full single-chip ``render()`` contract:
    probe2d view-space-gradient support, radii/visibility for densification
    statistics, per-band overflow accounting, gs/cam stop-grad switches.

    The per-Gaussian stage (transform, EWA projection, SH): replicated per
    device by default (its cost is two orders below compositing at 100k
    gaussians), or — with ``shard_projection`` — sharded over N along the
    tiles axis with an all_gather of the compact projected records
    ((mean2d, conic, depth, radius, rect, touched, rgb, opacity) ~16 f32
    per gaussian), so 1M+ gaussians don't replicate projection+SH work.
    "auto" shards when N >= SHARD_PROJECTION_MIN_N and the mesh has >1
    tile shard. Output rows beyond cam.height (band padding) are cropped.
    """
    n = means3d.shape[0]
    n_shards = mesh.shape[TILE_AXIS]
    if shard_projection == "auto":
        shard_projection = n_shards > 1 and n >= SHARD_PROJECTION_MIN_N
    pcam = pad_height_for(cam, n_shards)
    band_h = pcam.height // n_shards
    grid_ty_band = band_h // TILE
    band_max_inst = max(-(-max_instances // n_shards // 128) * 128, 128)
    if bg is None:
        bg = jnp.ones(3, jnp.float32)
    bg6 = jnp.concatenate([bg, jnp.ones(3, bg.dtype)])
    if active is None:
        active = jnp.ones(means3d.shape[0], bool)

    gs = (lambda x: x) if gs_grad else jax.lax.stop_gradient
    cg = (lambda x: x) if cam_grad else jax.lax.stop_gradient

    def composite_band(mean2d, conic, depth, radius, rect, touched, rgb,
                       opacity, bg6):
        bproj = ProjectedGaussians(mean2d=mean2d, conic=conic, depth=depth,
                                   radius=radius, tile_rect=rect,
                                   tiles_touched=touched)
        if impl == "oracle":
            colors6 = jnp.concatenate(
                [rgb, depth[:, None], jnp.ones_like(depth[:, None]),
                 (depth * depth)[:, None]], axis=1)
            out = rasterize_oracle(bproj, colors6, opacity, band_h,
                                   pcam.width, bg6)
            return out["image"], out["final_T"], jnp.zeros((1,), jnp.int32)
        cfg = RasterConfig(height=band_h, width=pcam.width,
                           max_instances=band_max_inst,
                           interpret=(impl == "pallas_interpret"))
        rgbz = jnp.concatenate([rgb, depth[:, None]], axis=1)
        out = rasterize_pallas(bproj, rgbz, opacity, cfg)
        image6 = out["image"] + out["final_T"][None] * bg6[:, None, None]
        return image6, out["final_T"], out["overflow"][None]

    rep = P()
    out_specs = (P(None, TILE_AXIS, None), P(TILE_AXIS, None), P(TILE_AXIS))

    if shard_projection:
        # ---- per-gaussian stage sharded over N along the tiles axis
        chunk = -(-n // n_shards)
        npad = chunk * n_shards - n

        def padn(x):
            if not npad:
                return x
            return jnp.pad(x, [(0, npad)] + [(0, 0)] * (x.ndim - 1))

        def band_sp(m3, qt, ls, lo, shc, act, pr, w2c, bg6):
            b = jax.lax.axis_index(TILE_AXIS)

            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, b * chunk, chunk)

            m3c = sl(m3)
            mean_cam = transform_points(w2c, m3c)
            projc = project_gaussians(mean_cam, jnp.exp(sl(ls)), sl(qt),
                                      pcam, active=sl(act))
            mean2d = projc.mean2d + sl(pr)
            dirs = m3c / jnp.maximum(
                jnp.linalg.norm(m3c, axis=-1, keepdims=True), 1e-8)
            rgbc = sh_to_rgb_clamped(sh_degree, sl(shc), dirs)
            opacc = jax.nn.sigmoid(sl(lo))
            rec = (mean2d, projc.conic, projc.depth, projc.radius,
                   projc.tile_rect, projc.tiles_touched, rgbc, opacc)
            # one compact all-gather replaces replicated projection
            mean2d, conic, depth, radius, rect, touched, rgb, opacity = (
                jax.lax.all_gather(r, TILE_AXIS, axis=0, tiled=True)
                for r in rec)
            full_radius = radius
            mean2d, rect, touched, radius = _clip_to_band(
                b, band_h, grid_ty_band, mean2d, rect, touched, radius)
            img, fT, ovf = composite_band(mean2d, conic, depth, radius,
                                          rect, touched, rgb, opacity,
                                          bg6)
            return img, fT, ovf, full_radius

        pr_in = (padn(probe2d) if probe2d is not None
                 else jnp.zeros((chunk * n_shards, 2), jnp.float32))
        # check_vma=False: see render_sharded
        image6, final_T, overflow, radius_full = jax.shard_map(
            band_sp, mesh=mesh, in_specs=(rep,) * 9,
            out_specs=out_specs + (rep,), check_vma=False,
        )(padn(gs(means3d)), padn(gs(quats)), padn(gs(log_scales)),
          padn(gs(logit_opacity)), padn(gs(sh_coeffs)),
          padn(active) if npad else active, pr_in, cg(w2c), bg6)
        radii = radius_full[:n]
    else:
        mean_cam = transform_points(cg(w2c), gs(means3d))
        proj = project_gaussians(mean_cam, jnp.exp(gs(log_scales)),
                                 gs(quats), pcam, active=active)
        mean2d = (proj.mean2d if probe2d is None
                  else proj.mean2d + probe2d)
        proj = proj._replace(mean2d=mean2d)
        dirs = means3d / jnp.maximum(
            jnp.linalg.norm(means3d, axis=-1, keepdims=True), 1e-8)
        rgb = sh_to_rgb_clamped(sh_degree, gs(sh_coeffs), dirs)
        opacity = jax.nn.sigmoid(gs(logit_opacity))

        def band(mean2d, conic, depth, radius, rect, touched, rgb,
                 opacity, bg6):
            b = jax.lax.axis_index(TILE_AXIS)
            mean2d, rect, touched, radius = _clip_to_band(
                b, band_h, grid_ty_band, mean2d, rect, touched, radius)
            return composite_band(mean2d, conic, depth, radius, rect,
                                  touched, rgb, opacity, bg6)

        # check_vma=False: see render_sharded
        image6, final_T, overflow = jax.shard_map(
            band, mesh=mesh, in_specs=(rep,) * 9,
            out_specs=out_specs, check_vma=False,
        )(proj.mean2d, proj.conic, proj.depth, proj.radius, proj.tile_rect,
          proj.tiles_touched, rgb, opacity, bg6)
        radii = proj.radius

    h = cam.height
    image6 = image6[:, :h]
    depth_img = image6[3]
    sil = image6[4]
    uncertainty = jax.lax.stop_gradient(image6[5] - depth_img * depth_img)
    return {
        "render": image6[0:3],
        "render_dep": depth_img,
        "render_sil": sil,
        "presence_mask": sil > 0.3,
        "uncertainty": uncertainty,
        "final_T": final_T[:h],
        "render_w2c": cg(w2c),
        "radii": radii,
        "visibility": radii > 0,
        "overflow": jnp.sum(overflow),
    }
