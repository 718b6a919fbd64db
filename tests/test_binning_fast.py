"""The sort-free hierarchical binning must produce the EXACT layout of the
sort-based reference binning (same gather_idx / starts / counts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.ops.binning import build_tile_bins
from freesurgs_tpu.ops.binning_fast import build_tile_bins_fast
from freesurgs_tpu.ops.projection import project_gaussians


def make_proj(rng, n, cam):
    means = np.stack([
        rng.uniform(-0.6, 0.6, n), rng.uniform(-0.5, 0.5, n),
        rng.uniform(0.15, 3.0, n)], -1).astype(np.float32)  # some culled
    scales = np.exp(rng.uniform(-4.5, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    return project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), cam)


@pytest.mark.parametrize("n,max_inst", [
    (50, 1024), (300, 4096), (300, 512),   # incl. overflow case
    (1000, 8192), (7, 128),
])
def test_fast_matches_reference(rng, n, max_inst):
    cam = Camera(height=48, width=64, fx=55.0, fy=55.0, cx=32.0, cy=24.0)
    gx, gy = 4, 3
    proj = make_proj(rng, n, cam)
    a = build_tile_bins(proj, gx, gy, max_inst)
    b = build_tile_bins_fast(proj, gx, gy, max_inst)
    np.testing.assert_array_equal(np.asarray(a.tile_start),
                                  np.asarray(b.tile_start))
    np.testing.assert_array_equal(np.asarray(a.tile_count),
                                  np.asarray(b.tile_count))
    np.testing.assert_array_equal(np.asarray(a.gather_idx),
                                  np.asarray(b.gather_idx))
    assert int(a.num_instances) == int(b.num_instances)
    assert int(a.overflow) == int(b.overflow)


def test_fast_no_active(rng):
    cam = Camera(height=32, width=32, fx=30.0, fy=30.0, cx=16.0, cy=16.0)
    proj = make_proj(rng, 20, cam)
    proj = proj._replace(radius=jnp.zeros_like(proj.radius),
                         tiles_touched=jnp.zeros_like(proj.tiles_touched),
                         tile_rect=jnp.zeros_like(proj.tile_rect))
    b = build_tile_bins_fast(proj, 2, 2, 256)
    assert int(b.num_instances) == 0
    assert np.all(np.asarray(b.gather_idx) == 20)


def test_fast_large_random(rng):
    cam = Camera(height=128, width=160, fx=120.0, fy=120.0, cx=80.0,
                 cy=64.0)
    proj = make_proj(rng, 5000, cam)
    a = build_tile_bins(proj, 10, 8, 65536)
    b = build_tile_bins_fast(proj, 10, 8, 65536)
    np.testing.assert_array_equal(np.asarray(a.gather_idx),
                                  np.asarray(b.gather_idx))
