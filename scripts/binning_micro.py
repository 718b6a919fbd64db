#!/usr/bin/env python
"""Phase-level attribution of the fast binner at bench sizes: time an
inline mirror of the binner truncated after each successive phase, so
phase cost = t[k] - t[k-1].  Chained jitted fori_loops (CLAUDE.md); the
chain feeds a scalar back into the inputs through a not-provably-finite
f32 (0.0 * log(|checksum|+0.5)) so XLA can neither hoist nor fold.

NOTE: the mirror is the PRE-round-2-optimization design (scatter-add
layout counts at stage 5, fused feat scatters at stage 8); its numbers
motivated the current ops/binning_fast.py (SAT-derived counts, feat via
one row gather in raster_pallas._build_feat) — see scripts/binning_exp.py
for the A/B measurements.

Usage: python scripts/binning_micro.py [--n 100000] [--maxi 393216]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 1280])
    ap.add_argument("--maxi", type=int, default=393_216)
    ap.add_argument("--bin-tile", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.ops.projection import project_gaussians
    from freesurgs_tpu.ops.binning import CHUNK, derive_bin_rect
    from freesurgs_tpu.ops.binning_fast import S1, S2

    H, W = args.hw
    N, m, iters = args.n, args.maxi, args.iters
    rng = np.random.default_rng(0)
    cam = Camera(height=H, width=W, fx=W * 0.78, fy=W * 0.78, cx=W / 2,
                 cy=H / 2)
    means = jnp.asarray(np.stack(
        [rng.uniform(-1.2, 1.2, N), rng.uniform(-1.0, 1.0, N),
         rng.uniform(0.8, 4.0, N)], -1).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.004, 0.012, (N, 3))).astype(np.float32))
    scales = jnp.exp(log_scales)
    fields = jnp.asarray(rng.normal(size=(N, 11)).astype(np.float32))

    bin_tile = args.bin_tile
    grid_x = -(-W // bin_tile)
    grid_y = -(-H // bin_tile)
    num_tiles = grid_x * grid_y

    proj0 = derive_bin_rect(
        project_gaussians(means, scales, quats, cam), bin_tile // 16)
    proj0 = jax.tree.map(jax.block_until_ready, proj0)

    def staged(stage, depth_in, rect_in, counts_in, fields_in):
        """bin_and_gather truncated after phase `stage` (mirrors
        ops/binning_fast.py; keep in sync when editing the real one)."""
        n = depth_in.shape[0]
        order = jnp.argsort(depth_in, stable=True)
        rect = rect_in[order]
        counts = counts_in[order]
        offsets = jnp.cumsum(counts)
        offsets_excl = offsets - counts
        kept = jnp.minimum(offsets[-1], m)
        if stage == 0:   # sort + offsets
            return (jnp.sum(rect) + jnp.sum(offsets_excl)
                    + kept).astype(jnp.float32)

        n_b2 = -(-n // S2)
        g_ids = jnp.arange(n, dtype=jnp.int32)
        bins = jnp.zeros((n_b2, grid_y + 1, grid_x + 1), jnp.int32)
        tx0, ty0, tx1, ty1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
        one = jnp.ones_like(tx0)
        b = g_ids // S2
        bins = bins.at[b, ty0, tx0].add(one, mode="drop")
        bins = bins.at[b, ty0, tx1].add(-one, mode="drop")
        bins = bins.at[b, ty1, tx0].add(-one, mode="drop")
        bins = bins.at[b, ty1, tx1].add(one, mode="drop")
        bins = jnp.cumsum(jnp.cumsum(bins, axis=1), axis=2)
        cov_sub = bins[:, :grid_y, :grid_x].reshape(n_b2, num_tiles)
        n_b1 = -(-n_b2 // (S1 // S2))
        pad_b2 = n_b1 * (S1 // S2) - n_b2
        cov_grp = jnp.pad(cov_sub, ((0, pad_b2), (0, 0))).reshape(
            n_b1, S1 // S2, num_tiles)
        P2g = jnp.cumsum(cov_grp, axis=1) - cov_grp
        cov_block = jnp.sum(cov_grp, axis=1)
        P1 = jnp.cumsum(cov_block, axis=0) - cov_block
        if stage == 1:   # + SAT & prefix tables
            return (jnp.sum(P1) + jnp.sum(P2g)).astype(jnp.float32)

        packed_rect = (rect[:, 0] | (rect[:, 1] << 8) | (rect[:, 2] << 16)
                       | (rect[:, 3] << 24)).astype(jnp.int32)
        sub_rows = jnp.pad(packed_rect, (0, n_b2 * S2 - n)).reshape(n_b2, S2)
        sub_rows_per_g = jnp.broadcast_to(
            sub_rows[:, None, :], (n_b2, S2, S2)).reshape(n_b2 * S2, S2)[:n]
        rec_cols = [offsets_excl[:, None], rect,
                    (g_ids // S2)[:, None], order[:, None].astype(jnp.int32),
                    (g_ids % S2)[:, None], sub_rows_per_g,
                    jax.lax.bitcast_convert_type(fields_in[order][:, :10],
                                                 jnp.int32)]
        rec = jnp.concatenate(rec_cols, axis=1)
        rec = jnp.concatenate(
            [rec, jnp.zeros((1, rec.shape[1]), jnp.int32)], axis=0)
        if stage == 2:   # + megarecord build
            return jnp.sum(rec[:, 0]).astype(jnp.float32)

        slots = jnp.arange(m, dtype=jnp.int32)
        pos_mark = jnp.where((counts > 0) & (offsets_excl < m),
                             offsets_excl, m)
        gmark = jnp.full((m + 1,), -1, jnp.int32)
        gmark = gmark.at[pos_mark].max(g_ids)[:m]
        g_sorted = jax.lax.cummax(gmark)
        slot_valid = (slots < kept) & (g_sorted >= 0)
        g_safe = jnp.where(slot_valid, g_sorted, n)
        if stage == 3:   # + slot map
            return jnp.sum(g_safe).astype(jnp.float32)

        rec_g = rec[g_safe]
        if stage == 4:   # + megarecord gather
            return jnp.sum(rec_g[:, 0]).astype(jnp.float32)

        off_g = rec_g[:, 0]
        tx0g, ty0g, tx1g = rec_g[:, 1], rec_g[:, 2], rec_g[:, 3]
        b2_g = rec_g[:, 5]
        orig_g = rec_g[:, 6]
        loc_g = rec_g[:, 7]
        subpk = rec_g[:, 8:8 + S2]
        local = slots - off_g
        width_g = jnp.maximum(tx1g - tx0g, 1)
        tile_y = ty0g + local // width_g
        tile_x = tx0g + local % width_g
        tile_id = jnp.where(slot_valid, tile_y * grid_x + tile_x, num_tiles)
        tile_safe = jnp.minimum(tile_id, num_tiles - 1)
        raw_count = jnp.zeros((num_tiles + 1,), jnp.int32).at[tile_id].add(
            jnp.where(slot_valid, 1, 0), mode="drop")[:num_tiles]
        padded_count = -(-raw_count // CHUNK) * CHUNK
        padded_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_count)[:-1]])
        fit_count = jnp.clip(m - padded_start, 0, raw_count)
        if stage == 5:   # + tile ids & layout
            return (jnp.sum(fit_count) + jnp.sum(tile_safe)
                    ).astype(jnp.float32)

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
        if stage == 6:   # + COMB gather & level-3 rank
            return jnp.sum(pos).astype(jnp.float32)

        keep = slot_valid & (pos < m)
        pos_safe = jnp.where(keep, pos, m)
        gather_idx = jnp.full((m + 1,), n, jnp.int32)
        gather_idx = gather_idx.at[pos_safe].set(
            jnp.where(keep, orig_g, n), mode="drop")[:m]
        if stage == 7:   # + gather_idx scatter
            return jnp.sum(gather_idx).astype(jnp.float32)

        vals = jax.lax.bitcast_convert_type(rec_g[:, 8 + S2:], jnp.float32)
        vals = jnp.where(keep[:, None], vals, 0.0)
        rows = [jnp.zeros((m + 1,), jnp.float32)
                .at[pos_safe].set(vals[:, k], mode="drop")[:m]
                for k in range(10)]
        feat = jnp.stack(rows)
        if stage == 8:   # + feat scatters
            return jnp.sum(feat) + jnp.sum(gather_idx).astype(jnp.float32)
        raise ValueError(stage)

    names = ["sort+offsets", "+SAT/prefix tables", "+megarecord build",
             "+slot map", "+megarecord gather", "+tile ids/layout",
             "+COMB gather/level3", "+gather_idx scatter", "+feat scatters"]

    def run(stage):
        @jax.jit
        def many(s):
            def body(_, s):
                eps = 0.0 * jnp.log(jnp.abs(s) + 0.5)  # runtime 0; unfoldable
                ie = eps.astype(jnp.int32)
                r = staged(stage, proj0.depth + eps,
                           proj0.tile_rect + ie,
                           proj0.tiles_touched + ie, fields + eps)
                return s + r
            return jax.lax.fori_loop(0, iters, body, s)
        s0 = jnp.float32(1.0)
        jax.block_until_ready(many(s0))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(many(s0))
            best = min(best, (time.time() - t0) / iters)
        return best

    print(f"config: {H}x{W} bin_tile={bin_tile} N={N} M={m} "
          f"grid={grid_x}x{grid_y}")
    prev = 0.0
    for k, name in enumerate(names):
        dt = run(k)
        print(f"{k}: {name:24s} {dt*1e3:8.2f} ms  "
              f"(delta {1e3*(dt-prev):+8.2f} ms)", flush=True)
        prev = dt


if __name__ == "__main__":
    sys.exit(main())
