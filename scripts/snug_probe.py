#!/usr/bin/env python
"""Measure instance-count reduction from snug_tile_rect on the bench scene."""
import numpy as np
import jax
import jax.numpy as jnp

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import transform_points
from freesurgs_tpu.ops.projection import project_gaussians
from freesurgs_tpu.ops.raster_pallas import snug_tile_rect
from freesurgs_tpu.ops.binning import derive_bin_rect

H, W, N = 1024, 1280, 100_000
rng = np.random.default_rng(0)
cam = Camera(height=H, width=W, fx=W * 0.78, fy=W * 0.78, cx=W / 2, cy=H / 2)
means = jnp.asarray(np.stack(
    [rng.uniform(-1.2, 1.2, N), rng.uniform(-1.0, 1.0, N),
     rng.uniform(0.8, 4.0, N)], -1).astype(np.float32))
quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
log_scales = jnp.asarray(
    np.log(rng.uniform(0.004, 0.012, (N, 3))).astype(np.float32))
logit_op = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))

mean_cam = transform_points(jnp.eye(4), means)
proj = project_gaussians(mean_cam, jnp.exp(log_scales), quats, cam)
opac = jax.nn.sigmoid(logit_op)
snug = snug_tile_rect(proj, opac)
for name, p in [("cuda-rect", proj), ("snug-rect", snug)]:
    for scale, tag in [(1, "16px"), (2, "32px")]:
        t = int(jnp.sum(derive_bin_rect(p, scale).tiles_touched))
        print(f"{name} {tag}: total instances = {t}")

# padded (CHUNK-aligned) capacity requirement at 32px with snug rects
from freesurgs_tpu.ops.binning import CHUNK
pb = derive_bin_rect(snug, 2)
gx, gy = -(-W // 32), -(-H // 32)
sat = jnp.zeros((gy + 1, gx + 1), jnp.int32)
r0 = pb.tile_rect
one = jnp.ones((N,), jnp.int32)
sat = sat.at[r0[:, 1], r0[:, 0]].add(one, mode="drop")
sat = sat.at[r0[:, 1], r0[:, 2]].add(-one, mode="drop")
sat = sat.at[r0[:, 3], r0[:, 0]].add(-one, mode="drop")
sat = sat.at[r0[:, 3], r0[:, 2]].add(one, mode="drop")
sat = jnp.cumsum(jnp.cumsum(sat, axis=0), axis=1)
raw = sat[:gy, :gx].reshape(-1)
padded = -(-raw // CHUNK) * CHUNK
print("snug 32px: padded capacity needed =", int(jnp.sum(padded)),
      "tiles =", gx * gy)
