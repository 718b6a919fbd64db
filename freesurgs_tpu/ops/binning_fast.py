"""Sort-free tile binning: hierarchical summed-area counting, fused gathers.

Drop-in replacement for ``binning.build_tile_bins`` producing the IDENTICAL
CHUNK-aligned instance layout without the O(M log^2 M) global XLA sort, and
(optionally) the kernel's (16, M) instance field buffer in the same pass.

Key identity: after depth-sorting the Gaussians, each Gaussian contributes
at most ONE instance per tile, so an instance's final rank within its tile
is exactly

    F(g, t) = #{ g' < g (depth order) : tile t inside rect(g') }

— a prefix count of rect coverage, evaluated hierarchically:

  level 1  blocks of S1 Gaussians: per-block tile-coverage counts from a
           4-corner scatter + 2D summed-area cumsum over the tile grid,
           then an exclusive cumsum over blocks               -> P1[b1, t]
  level 2  sub-blocks of S2 inside each block, same corner scatter at
           finer granularity, exclusive cumsum inside a block -> P2[b2, t]
  level 3  exact count among the < S2 predecessors in the sub-block by
           direct rect-containment tests                      -> P3

  position = aligned_tile_start[t] + P1 + P2 + P3.

TPU cost model (measured, v5e — scripts/binning_micro.py and
scripts/binning_exp.py): small cumsums and sub-M scatters are ~free, but
EVERY M-sized random-access pass (row gather, element gather, scatter-set,
scatter-add — sorted or not) costs the same ~14-18 ns/element latency
floor, ~5.5-7 ms at M=393k. The design therefore minimizes the number of
M-sized passes to four:

  1. the slot -> Gaussian map (scatter at exclusive offsets + cummax —
     no searchsorted);
  2. one gather of a per-Gaussian "megarecord" (depth-sorted) holding
     offsets, rect, sub-block id, original index, and the 32 byte-packed
     rects of the Gaussian's own sub-block (for level 3);
  3. one element gather from the combined table
     COMB[b2, t] = aligned_start[t] + P1[b1(b2), t] + P2[b2, t];
  4. one scatter-set of the final gather_idx.

Per-tile layout counts come from the (free) untruncated coverage totals
already present in the prefix tables — NOT from a scatter-add over slot
tile ids (measured 5.5 ms). Instance render fields are NOT carried here:
one (M, 16) row gather by gather_idx (raster_pallas._build_feat, ~7 ms)
beats 10 per-column scatter-sets (~21 ms).

Layout equality with ``build_tile_bins`` is asserted in
tests/test_binning_fast.py (including capacity-overflow cases).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import CHUNK, TileBins
from .projection import ProjectedGaussians

S1 = 1024   # level-1 block of gaussians
S2 = 32     # level-2 sub-block


def _sat_counts(rect, block_of_g, n_blocks, grid_x, grid_y):
    """Per-(block, tile) coverage counts via corner scatter + 2D cumsum."""
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


class BinAux(NamedTuple):
    """Byproducts of the fast binner that make the BACKWARD gaussian-
    gradient reduction sort- and scatter-free (raster_pallas uses them):
    in pre-slot (depth-major expansion) order every gaussian's instances
    are CONTIGUOUS, so a per-gaussian segment sum is one gather by ``pos``
    followed by a cumsum and two N-row lookups at ``seg_lo``/``seg_hi`` —
    instead of 10 M-sized scatter-adds (~21 ms at M=393k). The segment
    bounds are stored in ORIGINAL gaussian order (the depth-rank
    unscramble is paid once here at bin time, not on every backward —
    which matters under ``rebin_every`` layout reuse)."""
    pos: jnp.ndarray       # (M,) pre-slot -> final layout position (m if
                           #      dropped/invalid)
    seg_lo: jnp.ndarray    # (N,) gaussian -> first pre-slot (clamped, orig
                           #      order)
    seg_hi: jnp.ndarray    # (N,) gaussian -> one-past-last pre-slot


def build_tile_bins_fast(proj: ProjectedGaussians, grid_x: int,
                         grid_y: int, max_instances: int,
                         return_aux: bool = False):
    """Sort-free tile binning (layout-identical to ``build_tile_bins``)."""
    assert max_instances % CHUNK == 0
    n = proj.depth.shape[0]
    num_tiles = grid_x * grid_y
    m = max_instances

    order = jnp.argsort(jnp.where(proj.radius > 0, proj.depth, jnp.inf),
                        stable=True)
    rect = proj.tile_rect[order]                   # (N, 4), depth order
    # tiles_touched == rect area by construction everywhere upstream
    # (projection/derive_bin_rect/snug all zero the rect when they zero
    # the count), so deriving counts from the gathered rect saves one
    # N-sized random gather (~1.5 ms at N=100k).
    counts = (rect[:, 2] - rect[:, 0]) * (rect[:, 3] - rect[:, 1])
    offsets = jnp.cumsum(counts)
    offsets_excl = offsets - counts
    total = offsets[-1]
    kept = jnp.minimum(total, m)

    # ---- hierarchical coverage prefix tables
    n_b2 = -(-n // S2)
    g_ids = jnp.arange(n, dtype=jnp.int32)
    cov_sub = _sat_counts(rect, g_ids // S2, n_b2, grid_x, grid_y)
    cov_sub = cov_sub.reshape(n_b2, num_tiles)     # (B2, T)
    n_b1 = -(-n_b2 // (S1 // S2))
    pad_b2 = n_b1 * (S1 // S2) - n_b2
    cov_grp = jnp.pad(cov_sub, ((0, pad_b2), (0, 0))).reshape(
        n_b1, S1 // S2, num_tiles)
    P2g = jnp.cumsum(cov_grp, axis=1) - cov_grp    # (B1, S1/S2, T)
    cov_block = jnp.sum(cov_grp, axis=1)
    P1 = jnp.cumsum(cov_block, axis=0) - cov_block  # (B1, T)

    # ---- per-Gaussian megarecord (all slot-phase lookups in ONE gather)
    packed_rect = (rect[:, 0] | (rect[:, 1] << 8) | (rect[:, 2] << 16)
                   | (rect[:, 3] << 24)).astype(jnp.int32)
    sub_rows = jnp.pad(packed_rect, (0, n_b2 * S2 - n)).reshape(n_b2, S2)
    # broadcast (not repeat: repeat lowers to a slow gather) each sub-block
    # row to its S2 gaussians
    sub_rows_per_g = jnp.broadcast_to(
        sub_rows[:, None, :], (n_b2, S2, S2)).reshape(n_b2 * S2, S2)[:n]
    rec_cols = [offsets_excl[:, None], rect,
                (g_ids // S2)[:, None], order[:, None].astype(jnp.int32),
                (g_ids % S2)[:, None], sub_rows_per_g]
    rec = jnp.concatenate(rec_cols, axis=1)         # (N, 8+S2)
    rec = jnp.concatenate(
        [rec, jnp.zeros((1, rec.shape[1]), jnp.int32)], axis=0)

    # ---- slot -> gaussian map (scatter + cummax; no searchsorted)
    slots = jnp.arange(m, dtype=jnp.int32)
    pos_mark = jnp.where((counts > 0) & (offsets_excl < m),
                         offsets_excl, m)
    gmark = jnp.full((m + 1,), -1, jnp.int32)
    gmark = gmark.at[pos_mark].max(g_ids)[:m]
    g_sorted = jax.lax.cummax(gmark)
    slot_valid = (slots < kept) & (g_sorted >= 0)
    g_safe = jnp.where(slot_valid, g_sorted, n)     # sentinel zero row

    rec_g = rec[g_safe]                             # THE megarecord gather
    off_g = rec_g[:, 0]
    tx0, ty0, tx1 = rec_g[:, 1], rec_g[:, 2], rec_g[:, 3]
    b2_g = rec_g[:, 5]
    orig_g = rec_g[:, 6]
    loc_g = rec_g[:, 7]
    subpk = rec_g[:, 8:8 + S2]                      # (M, S2) packed rects

    local = slots - off_g
    width_g = jnp.maximum(tx1 - tx0, 1)
    tile_y = ty0 + local // width_g
    tile_x = tx0 + local % width_g
    tile_id = jnp.where(slot_valid, tile_y * grid_x + tile_x, num_tiles)
    tile_safe = jnp.minimum(tile_id, num_tiles - 1)

    # Per-tile layout counts: the untruncated coverage totals, free from
    # the block prefix tables (an M-sized scatter-add here costs ~5.5 ms).
    raw_count = P1[-1] + cov_block[-1]              # (T,)
    padded_count = -(-raw_count // CHUNK) * CHUNK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_count)[:-1]])
    fit_count = jnp.clip(m - padded_start, 0, raw_count)

    # ---- rank: COMB gather + in-register level 3
    COMB = (P1[:, None, :] + P2g
            + padded_start[None, None, :]).reshape(-1, num_tiles)
    pos0 = COMB.reshape(-1)[b2_g * num_tiles + tile_safe]
    ptx0 = subpk & 0xFF
    pty0 = (subpk >> 8) & 0xFF
    ptx1 = (subpk >> 16) & 0xFF
    pty1 = (subpk >> 24) & 0xFF
    k32 = jnp.arange(S2, dtype=jnp.int32)[None, :]
    contains = ((tile_x[:, None] >= ptx0) & (tile_x[:, None] < ptx1)
                & (tile_y[:, None] >= pty0) & (tile_y[:, None] < pty1)
                & (k32 < loc_g[:, None]))
    pos = pos0 + jnp.sum(contains, axis=1).astype(jnp.int32)

    # keep = slot_valid & pos < m: rank < raw_count holds by construction,
    # and rank < fit_count[tile] is equivalent to pos < m.
    keep = slot_valid & (pos < m)
    pos_safe = jnp.where(keep, pos, m)
    gather_idx = jnp.full((m + 1,), n, jnp.int32)
    gather_idx = gather_idx.at[pos_safe].set(
        jnp.where(keep, orig_g, n), mode="drop")[:m]

    kept_final = jnp.sum(keep).astype(jnp.int32)
    bins = TileBins(gather_idx=gather_idx, tile_start=padded_start,
                    tile_count=fit_count, num_instances=kept_final,
                    overflow=(total - kept_final).astype(jnp.int32))
    if return_aux:
        # Segment bounds for the backward per-gaussian reduction, clamped
        # to capacity and unscrambled to original gaussian order (two
        # N-scatters here replace an N-scatter + N-gather on EVERY
        # backward call).
        o1 = jnp.minimum(offsets, m).astype(jnp.int32)
        o0 = jnp.minimum(offsets_excl, m).astype(jnp.int32)
        seg_hi = jnp.zeros((n,), jnp.int32).at[order].set(o1)
        seg_lo = jnp.zeros((n,), jnp.int32).at[order].set(o0)
        return bins, BinAux(pos=pos_safe, seg_lo=seg_lo, seg_hi=seg_hi)
    return bins
