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
    to (gaussian, covered-tile-cell);
 3. stable-sort instances by tile id — stability preserves the front-to-back
    depth order within each tile, exactly like the CUDA (tile | depth) key
    radix sort;
 4. re-pack each tile's run at a CHUNK-aligned offset (padding slots point
    at a dummy all-zero Gaussian). Alignment lets the Pallas kernels DMA
    (16, CHUNK) lane-aligned blocks, and makes every tile's backward
    gradient writes disjoint — no inter-tile write ordering hazards.

Capacity is ``max_instances`` (a CHUNK multiple); overflowing instances are
dropped deepest-first (expansion is in depth order) and counted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .projection import ProjectedGaussians

import os

# Instances per kernel step; lane-dim alignment quantum. Larger CHUNK
# amortizes kernel loop/DMA overhead but inflates per-tile padding (one
# extra half-chunk of M per tile on average); 128 is the measured sweet
# spot on v5e. FSTPU_CHUNK overrides for A/B experiments only — layouts,
# kernels and capacity all derive from this single constant.
CHUNK = int(os.environ.get("FSTPU_CHUNK", "128"))


def derive_bin_rect(proj: ProjectedGaussians, scale: int
                    ) -> ProjectedGaussians:
    """Coarsen the 16px tile rect to (16*scale)px binning granularity.

    Binning at 32x32 while compositing masks per pixel with the original
    16px rect is exactly equivalent to the CUDA 16px binning (an instance's
    16-rect containing a pixel's 16-tile implies overlap with the enclosing
    32-tile), but produces ~2-3x fewer duplicated instances — the instance
    count, not the kernel, is the TPU bottleneck (BASELINE.md).
    """
    if scale == 1:
        return proj
    r = proj.tile_rect
    lo = r[:, 0:2] // scale
    hi = -(-r[:, 2:4] // scale)
    rect = jnp.concatenate([lo, hi], axis=1)
    tiles = (hi[:, 0] - lo[:, 0]) * (hi[:, 1] - lo[:, 1])
    tiles = jnp.where(proj.tiles_touched > 0, tiles, 0).astype(jnp.int32)
    rect = jnp.where((proj.tiles_touched > 0)[:, None], rect, 0)
    return proj._replace(tile_rect=rect.astype(jnp.int32),
                         tiles_touched=tiles)


class TileBins(NamedTuple):
    gather_idx: jnp.ndarray    # (M,) instance slot -> original gaussian index
                               #      (== n for padding/empty slots)
    tile_start: jnp.ndarray    # (T,) int32 CHUNK-aligned start per tile
    tile_count: jnp.ndarray    # (T,) int32 real instances in tile
    num_instances: jnp.ndarray  # () int32 total kept (real) instances
    overflow: jnp.ndarray      # () int32 dropped instances


def build_tile_bins(proj: ProjectedGaussians, grid_x: int, grid_y: int,
                    max_instances: int) -> TileBins:
    assert max_instances % CHUNK == 0, "max_instances must be CHUNK-aligned"
    n = proj.depth.shape[0]
    num_tiles = grid_x * grid_y
    m = max_instances

    sort_key = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)

    rect = proj.tile_rect[order]                # (N, 4) tx0, ty0, tx1, ty1
    counts = proj.tiles_touched[order]          # (N,)
    offsets = jnp.cumsum(counts)                # inclusive
    total = offsets[-1]
    offsets_excl = offsets - counts

    slots = jnp.arange(m, dtype=jnp.int32)
    # Which depth-sorted gaussian owns flat instance slot j?
    g = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    local = slots - offsets_excl[g_safe]
    rect_g = rect[g_safe]
    width_g = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tile_y = rect_g[:, 1] + local // width_g
    tile_x = rect_g[:, 0] + local % width_g
    kept = jnp.minimum(total, m).astype(jnp.int32)
    slot_valid = slots < kept
    tile_id = jnp.where(slot_valid, tile_y * grid_x + tile_x, num_tiles)

    # Stable sort by tile id; within a tile the depth order is preserved.
    perm = jnp.argsort(tile_id, stable=True)
    tile_sorted = tile_id[perm]                  # (M,)
    g_orig = order[g_safe[perm]].astype(jnp.int32)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    raw_start = jnp.searchsorted(tile_sorted, tile_ids,
                                 side="left").astype(jnp.int32)

    # Layout (per-tile counts -> CHUNK-aligned starts) derives from the
    # UNTRUNCATED coverage — a 4-corner scatter + 2D summed-area cumsum,
    # order-independent, so no slot expansion needed. This matches
    # binning_fast (which gets the same totals from its prefix tables for
    # free) and keeps the layout independent of the capacity m. Dropped
    # instances are a per-tile depth-suffix (expansion is depth-ordered),
    # so kept instances always occupy a prefix of their tile's run;
    # positions of dropped ones keep the sentinel gather index n, which
    # composites to nothing.
    r0 = proj.tile_rect
    sat = jnp.zeros((grid_y + 1, grid_x + 1), jnp.int32)
    onec = jnp.ones((n,), jnp.int32)
    sat = sat.at[r0[:, 1], r0[:, 0]].add(onec, mode="drop")
    sat = sat.at[r0[:, 1], r0[:, 2]].add(-onec, mode="drop")
    sat = sat.at[r0[:, 3], r0[:, 0]].add(-onec, mode="drop")
    sat = sat.at[r0[:, 3], r0[:, 2]].add(onec, mode="drop")
    sat = jnp.cumsum(jnp.cumsum(sat, axis=0), axis=1)
    raw_count = sat[:grid_y, :grid_x].reshape(num_tiles)

    padded_count = -(-raw_count // CHUNK) * CHUNK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_count)[:-1]])
    # Clamp tiles that no longer fit after alignment padding.
    fit_count = jnp.clip(m - padded_start, 0, raw_count)

    # Scatter each sorted raw instance to its aligned position. The rank
    # among expanded (<= m) instances equals the rank among the full
    # coverage for every kept instance (see above), so the two layouts
    # agree wherever an instance is actually placed.
    in_tile = tile_sorted < num_tiles
    key_safe = jnp.minimum(tile_sorted, num_tiles - 1)
    rank = jnp.arange(m, dtype=jnp.int32) - raw_start[key_safe]
    pos = padded_start[key_safe] + rank
    keep = in_tile & (pos < m)
    pos_safe = jnp.where(keep, pos, m)  # dropped -> scratch slot m
    gather_idx = jnp.full((m + 1,), n, jnp.int32)
    gather_idx = gather_idx.at[pos_safe].set(
        jnp.where(keep, g_orig, n))[:m]

    kept_final = jnp.sum(keep).astype(jnp.int32)
    return TileBins(gather_idx=gather_idx,
                    tile_start=padded_start,
                    tile_count=fit_count,
                    num_instances=kept_final,
                    overflow=(total - kept_final).astype(jnp.int32))
