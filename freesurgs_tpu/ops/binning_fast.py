"""Sort-free tile binning: hierarchical summed-area counting.

Drop-in replacement for ``binning.build_tile_bins`` that produces the
IDENTICAL CHUNK-aligned instance layout without the O(M log^2 M) global
XLA sort (which dominated the render at ~100ms for M=512k on v5e; this
path is scatter/cumsum/gather only).

Key identity: after depth-sorting the Gaussians, each Gaussian contributes
at most ONE instance per tile, so an instance's final rank within its tile
is exactly

    F(g, t) = #{ g' < g (depth order) : tile t inside rect(g') }

— a prefix count of rect coverage. F is evaluated hierarchically:

  level 1  blocks of S1 Gaussians: per-block tile-coverage counts from a
           4-corner scatter + 2D summed-area cumsum over the tile grid,
           then an exclusive cumsum over blocks               -> P1[b1, t]
  level 2  sub-blocks of S2 inside each block, same corner-scatter at
           finer granularity, exclusive cumsum inside a block -> P2[b2, t]
  level 3  exact count among the < S2 predecessors in the sub-block by
           direct rect-containment tests                       -> P3

  F = P1[g // S1, t] + P2[g // S2, t] + P3,
  position = aligned_tile_start[t] + F.

The slot -> Gaussian expansion similarly avoids searchsorted: scatter each
Gaussian's depth-sorted index at its exclusive offset, then a cummax fills
the gaps.

All quantities (capacity clamping, CHUNK alignment, overflow accounting)
match ``build_tile_bins`` exactly — asserted in tests/test_binning_fast.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import CHUNK, TileBins
from .projection import ProjectedGaussians

S1 = 1024   # level-1 block of gaussians
S2 = 32     # level-2 sub-block


def _sat_counts(rect, block_of_g, n_blocks, grid_x, grid_y):
    """Per-(block, tile) coverage counts via corner scatter + 2D cumsum.

    rect: (N, 4) int32 (tx0, ty0, tx1, ty1) half-open, zeroed when culled.
    Returns (n_blocks, grid_y, grid_x) int32.
    """
    bins = jnp.zeros((n_blocks, grid_y + 1, grid_x + 1), jnp.int32)
    tx0, ty0, tx1, ty1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    one = jnp.ones_like(tx0)
    b = block_of_g
    bins = bins.at[b, ty0, tx0].add(one, mode="drop")
    bins = bins.at[b, ty0, tx1].add(-one, mode="drop")
    bins = bins.at[b, ty1, tx0].add(-one, mode="drop")
    bins = bins.at[b, ty1, tx1].add(one, mode="drop")
    bins = jnp.cumsum(jnp.cumsum(bins, axis=1), axis=2)
    return bins[:, :grid_y, :grid_x]


def build_tile_bins_fast(proj: ProjectedGaussians, grid_x: int, grid_y: int,
                         max_instances: int) -> TileBins:
    assert max_instances % CHUNK == 0
    n = proj.depth.shape[0]
    num_tiles = grid_x * grid_y
    m = max_instances

    order = jnp.argsort(jnp.where(proj.radius > 0, proj.depth, jnp.inf),
                        stable=True)
    rect = proj.tile_rect[order]                   # (N, 4), depth order
    counts = proj.tiles_touched[order]
    offsets = jnp.cumsum(counts)
    offsets_excl = offsets - counts
    total = offsets[-1]

    # ---- hierarchical coverage prefix tables
    n_b2 = -(-n // S2)
    g_ids = jnp.arange(n, dtype=jnp.int32)
    cov_sub = _sat_counts(rect, g_ids // S2, n_b2, grid_x, grid_y)
    cov_sub = cov_sub.reshape(n_b2, num_tiles)     # (B2, T)
    n_b1 = -(-n_b2 // (S1 // S2))
    pad_b2 = n_b1 * (S1 // S2) - n_b2
    cov_sub_p = jnp.pad(cov_sub, ((0, pad_b2), (0, 0)))
    cov_grp = cov_sub_p.reshape(n_b1, S1 // S2, num_tiles)
    # exclusive cumsum of sub-blocks within their block
    P2 = jnp.cumsum(cov_grp, axis=1) - cov_grp     # (B1, S1/S2, T)
    P2 = P2.reshape(n_b1 * (S1 // S2), num_tiles)
    cov_block = jnp.sum(cov_grp, axis=1)           # (B1, T)
    P1 = jnp.cumsum(cov_block, axis=0) - cov_block
    tile_total = (P1[-1] + cov_block[-1]).astype(jnp.int32)  # (T,)

    # capacity-aware aligned layout (identical math to build_tile_bins)
    # raw kept instances: expansion slots < m, deepest dropped first
    kept = jnp.minimum(total, m)
    # per-tile raw counts among KEPT instances: tile_total minus the
    # dropped tail's contribution. Compute dropped-tail coverage with the
    # same SAT over the dropped gaussians' partial rects is complex;
    # instead clamp each tile's count by how many of its instances fall
    # below the slot cap — derived per instance below, counted by scatter.

    # ---- slot -> gaussian map (no searchsorted): scatter + cummax
    slots = jnp.arange(m, dtype=jnp.int32)
    pos_mark = jnp.where((counts > 0) & (offsets_excl < m),
                         offsets_excl, m)
    gmark = jnp.full((m + 1,), -1, jnp.int32)
    gmark = gmark.at[pos_mark].max(g_ids)[:m]
    g_sorted = jax.lax.cummax(gmark)               # (M,) depth-order index
    slot_valid = slots < kept
    g_safe = jnp.clip(g_sorted, 0, n - 1)

    local = slots - offsets_excl[g_safe]
    rect_g = rect[g_safe]
    width_g = jnp.maximum(rect_g[:, 2] - rect_g[:, 0], 1)
    tile_y = rect_g[:, 1] + local // width_g
    tile_x = rect_g[:, 0] + local % width_g
    tile_id = jnp.where(slot_valid, tile_y * grid_x + tile_x, num_tiles)
    tile_safe = jnp.minimum(tile_id, num_tiles - 1)

    # per-tile count of kept instances (for meta + alignment)
    raw_count = jnp.zeros((num_tiles + 1,), jnp.int32).at[tile_id].add(
        jnp.where(slot_valid, 1, 0), mode="drop")[:num_tiles]
    padded_count = -(-raw_count // CHUNK) * CHUNK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_count)[:-1]])
    fit_count = jnp.clip(m - padded_start, 0, raw_count)

    # ---- rank within tile: F = P1 + P2 + P3
    b1 = g_safe // S1
    b2 = g_safe // S2
    rank = (P1[b1, tile_safe] + P2[b2, tile_safe]).astype(jnp.int32)
    # level 3: predecessors within the sub-block
    rects_by_sub = jnp.pad(
        rect.astype(jnp.int32), ((0, n_b2 * S2 - n), (0, 0))
    ).reshape(n_b2, S2, 4)
    r32 = rects_by_sub[b2]                         # (M, S2, 4)
    loc = (g_safe % S2)[:, None]
    k32 = jnp.arange(S2, dtype=jnp.int32)[None, :]
    contains = ((tile_x[:, None] >= r32[:, :, 0])
                & (tile_x[:, None] < r32[:, :, 2])
                & (tile_y[:, None] >= r32[:, :, 1])
                & (tile_y[:, None] < r32[:, :, 3])
                & (k32 < loc))
    rank = rank + jnp.sum(contains, axis=1).astype(jnp.int32)

    pos = padded_start[tile_safe] + rank
    keep = slot_valid & (rank < fit_count[tile_safe]) & (pos < m)
    pos_safe = jnp.where(keep, pos, m)
    gather_idx = jnp.full((m + 1,), n, jnp.int32)
    gather_idx = gather_idx.at[pos_safe].set(
        jnp.where(keep, order[g_safe], n), mode="drop")[:m]

    kept_final = jnp.sum(fit_count).astype(jnp.int32)
    return TileBins(gather_idx=gather_idx, tile_start=padded_start,
                    tile_count=fit_count, num_instances=kept_final,
                    overflow=(total - kept_final).astype(jnp.int32))
