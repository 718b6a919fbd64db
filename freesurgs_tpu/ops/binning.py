"""Tile binning: depth sort + per-tile instance list construction.

TPU-native recast of the CUDA duplication + radix-sort stage
(upstream diff-gaussian-rasterization ``duplicateWithKeys`` /
``SortPairs``; see SURVEY.md section 2.1 N1): everything is built from
static-shape XLA primitives — ``argsort``, ``cumsum``, ``searchsorted``,
gathers and one stable key sort — instead of dynamic duplication.

Pipeline (all shapes static, jit-safe):
 1. sort Gaussians front-to-back by camera depth (culled -> +inf keys);
 2. expand each Gaussian into one *instance* per covered tile, using
    exclusive-cumsum offsets + searchsorted to map a flat instance slot back
    to (gaussian, covered-tile-cell); capacity ``max_instances`` with
    overflow counting (deepest instances dropped first, since expansion is
    in depth order);
 3. stable-sort instances by tile id — stability preserves the front-to-back
    depth order within each tile, exactly like the CUDA (tile | depth) key
    radix sort;
 4. per-tile (start, count) ranges via searchsorted.

The compositing kernels then walk each tile's contiguous instance range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .projection import ProjectedGaussians


class TileBins(NamedTuple):
    order: jnp.ndarray         # (N,) gaussian index by ascending depth
    gather_idx: jnp.ndarray    # (M,) instance -> original gaussian index
                               #      (== n for padding slots, n = num gaussians)
    tile_of_instance: jnp.ndarray  # (M,) tile id (== num_tiles for padding)
    tile_start: jnp.ndarray    # (T,) int32 start into the instance buffer
    tile_count: jnp.ndarray    # (T,) int32 instances in tile
    num_instances: jnp.ndarray  # () int32 total kept instances
    overflow: jnp.ndarray      # () int32 dropped instances (capacity overflow)


def build_tile_bins(proj: ProjectedGaussians, grid_x: int, grid_y: int,
                    max_instances: int) -> TileBins:
    n = proj.depth.shape[0]
    num_tiles = grid_x * grid_y

    sort_key = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)

    rect = proj.tile_rect[order]                # (N, 4) tx0, ty0, tx1, ty1
    counts = proj.tiles_touched[order]          # (N,)
    offsets = jnp.cumsum(counts)                # inclusive
    total = offsets[-1] if n > 0 else jnp.int32(0)
    offsets_excl = offsets - counts

    slots = jnp.arange(max_instances, dtype=jnp.int32)
    # Which depth-sorted gaussian owns flat instance slot j?
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    local = slots - offsets_excl[g_safe]
    rect_g = rect[g_safe]
    width_g = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tile_y = rect_g[:, 1] + local // width_g
    tile_x = rect_g[:, 0] + local % width_g
    slot_valid = slots < jnp.minimum(total, max_instances)
    tile_id = jnp.where(slot_valid, tile_y * grid_x + tile_x, num_tiles)

    # Stable sort by tile id; within a tile the depth order is preserved.
    perm = jnp.argsort(tile_id, stable=True)
    tile_sorted = tile_id[perm]
    gather_idx = jnp.where(tile_sorted < num_tiles,
                           order[g_safe[perm]], n).astype(jnp.int32)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids,
                                  side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_ids,
                                side="right").astype(jnp.int32)
    kept = jnp.minimum(total, max_instances).astype(jnp.int32)
    return TileBins(order=order, gather_idx=gather_idx,
                    tile_of_instance=tile_sorted,
                    tile_start=tile_start, tile_count=tile_end - tile_start,
                    num_instances=kept,
                    overflow=(total - kept).astype(jnp.int32))
