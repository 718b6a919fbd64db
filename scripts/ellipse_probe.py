#!/usr/bin/env python
"""Measure the instance reduction of EXACT ellipse-tile intersection tests.

The snug rect (raster_pallas.snug_tile_rect) is the axis-aligned bounding
box of the alpha>=1/255 ellipse; tiles in the box's corners that the
ellipse misses still become instances. This probe counts, on the bench
scene, how many 32px-binned instances an exact convex-QP ellipse-vs-tile
test would drop — the upper bound for any ellipse-aware culling scheme.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import transform_points
from freesurgs_tpu.ops.projection import project_gaussians
from freesurgs_tpu.ops.raster_pallas import _prune_and_snug
from freesurgs_tpu.ops.binning import derive_bin_rect

H, W, N = 1024, 1280, 100_000
BT = 32
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
pb = derive_bin_rect(_prune_and_snug(proj, opac), BT // 16)

rect = np.asarray(pb.tile_rect)          # (N, 4) 32px-tile rect
mean2d = np.asarray(pb.mean2d)
conic = np.asarray(pb.conic)             # (a, b, c): Q = a dx^2 + 2b dxdy + c dy^2
op = np.asarray(opac)
t2 = 2.0 * np.log(np.maximum(255.0 * op, 1.0))

w = np.maximum(rect[:, 2] - rect[:, 0], 0)
h = np.maximum(rect[:, 3] - rect[:, 1], 0)
counts = (w * h).astype(np.int64)
M = int(counts.sum())
print(f"snug-rect instances (32px): {M}")

# histogram of rect sizes
for lim in [1, 2, 4, 6, 9, 12, 10**9]:
    sel = (counts > 0) & (counts <= lim)
    print(f"  rects with tiles<={lim}: gaussians={sel.sum()}, "
          f"instances={counts[sel].sum()}")

# expand (gaussian, tile) pairs
gi = np.repeat(np.arange(N), counts)
local = np.arange(len(gi)) - np.repeat(np.cumsum(counts) - counts, counts)
wg = np.maximum(w[gi], 1)
tx = rect[gi, 0] + local % wg
ty = rect[gi, 1] + local // wg

# tile pixel-center bounds relative to the mean
lx = tx * BT - mean2d[gi, 0]
ux = tx * BT + (BT - 1) - mean2d[gi, 0]
ly = ty * BT - mean2d[gi, 1]
uy = ty * BT + (BT - 1) - mean2d[gi, 1]
A, B, C = conic[gi, 0], conic[gi, 1], conic[gi, 2]

inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)


def qval(dx, dy):
    return A * dx * dx + 2 * B * dx * dy + C * dy * dy


qmin = np.full(len(gi), np.inf, np.float64)
for ex in (lx, ux):
    dy = np.clip(-B * ex / np.maximum(C, 1e-12), ly, uy)
    qmin = np.minimum(qmin, qval(ex, dy))
for ey in (ly, uy):
    dx = np.clip(-B * ey / np.maximum(A, 1e-12), lx, ux)
    qmin = np.minimum(qmin, qval(dx, ey))
qmin = np.where(inside, 0.0, qmin)
keep = qmin <= t2[gi] + 1e-6
kept = int(keep.sum())
print(f"ellipse-exact instances:    {kept}  ({kept / M:.3f} of snug)")

# how much of the reduction comes from big rects only (>= 6 tiles)?
big = counts[gi] >= 6
print(f"  reduction in big rects (>=6 tiles): "
      f"{int((~keep & big).sum())} of {int(big.sum())}")
print(f"  reduction in small rects (<6): "
      f"{int((~keep & ~big).sum())} of {int((~big).sum())}")
