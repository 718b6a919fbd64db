#!/usr/bin/env python
"""Precise stage-level timing at the bench config (chained jitted loops).

Each stage is timed as a jitted fori_loop with a data dependency between
iterations (the only reliable timing through the remote TPU tunnel; see
CLAUDE.md). Stages nest, so stage cost = t[stage] - t[prev stage].

Usage: python scripts/stage_timing.py [--n 100000] [--hw 1024 1280]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x, iters):
    import jax
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(fn(x))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 1280])
    ap.add_argument("--maxi", type=int, default=1_048_576)
    ap.add_argument("--bin-tile", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.core.sh import sh_to_rgb_clamped
    from freesurgs_tpu.ops.projection import project_gaussians, TILE
    from freesurgs_tpu.ops.binning import derive_bin_rect
    from freesurgs_tpu.ops.binning_fast import build_tile_bins_fast
    from freesurgs_tpu.ops.render import render
    from freesurgs_tpu.ops.raster_pallas import (
        RasterConfig, _run_fwd, _make_composite)

    H, W = args.hw
    N, MAXI, iters = args.n, args.maxi, args.iters
    sh_deg, sh_k = 3, 16
    rng = np.random.default_rng(0)
    cam = Camera(height=H, width=W, fx=W * 0.78, fy=W * 0.78, cx=W / 2,
                 cy=H / 2)
    means = jnp.asarray(np.stack(
        [rng.uniform(-1.2, 1.2, N), rng.uniform(-1.0, 1.0, N),
         rng.uniform(0.8, 4.0, N)], -1).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.004, 0.012, (N, 3))).astype(np.float32))
    logit_op = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(N, sh_k, 3)).astype(np.float32) * 0.3)
    opac = jax.nn.sigmoid(logit_op)
    scales = jnp.exp(log_scales)
    cfg = RasterConfig(height=H, width=W, max_instances=MAXI,
                       interpret=False, bin_tile=args.bin_tile)

    def chain(stage_fn):
        @jax.jit
        def many(m):
            def body(_, m):
                return m + 0.0 * stage_fn(m)   # stage_fn returns a scalar
            return jax.lax.fori_loop(0, iters, body, m)
        return many

    # stage 1: projection only
    def s_proj(m):
        p = project_gaussians(m, scales, quats, cam)
        return jnp.sum(p.mean2d[:, 0]) + jnp.sum(p.depth)

    # stage 2: projection + binning (bins only, no fields)
    def s_bins(m):
        p = derive_bin_rect(project_gaussians(m, scales, quats, cam),
                            cfg.bin_scale)
        bins = build_tile_bins_fast(p, cfg.grid_x, cfg.grid_y, MAXI)
        return jnp.sum(bins.gather_idx).astype(jnp.float32)

    # stage 3: projection + binning + fields gather
    from freesurgs_tpu.ops.raster_pallas import _build_feat, _field_cols

    def s_feat(m):
        p = project_gaussians(m, scales, quats, cam)
        dirs = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True),
                               1e-8)
        rgb = sh_to_rgb_clamped(sh_deg, sh, dirs)
        rgbz = jnp.concatenate([rgb, p.depth[:, None]], 1)
        fields = _field_cols(p.mean2d, p.conic, rgbz, opac, p.tile_rect, cfg)
        pb = derive_bin_rect(p, cfg.bin_scale)
        bins = build_tile_bins_fast(pb, cfg.grid_x, cfg.grid_y, MAXI)
        feat, _ = _build_feat(fields, bins)
        return jnp.sum(feat)

    # stage 4: full forward
    def s_fwd(m):
        out = render(m, quats, log_scales, logit_op, sh, jnp.eye(4), cam,
                     impl="pallas", sh_degree=sh_deg, max_instances=MAXI,
                     bin_tile=args.bin_tile)
        return jnp.mean(out["render"])

    # stage 5: fwd+bwd
    def loss(m):
        out = render(m, quats, log_scales, logit_op, sh, jnp.eye(4), cam,
                     impl="pallas", sh_degree=sh_deg, max_instances=MAXI,
                     bin_tile=args.bin_tile)
        return jnp.mean(out["render"] ** 2) + 0.1 * jnp.mean(out["render_dep"])

    def s_bwd(m):
        return jnp.sum(jax.grad(loss)(m))

    stages = [("projection", s_proj), ("(+)binning", s_bins),
              ("(+)fields", s_feat), ("full fwd", s_fwd),
              ("fwd+bwd", s_bwd)]
    prev = 0.0
    print(f"config: {H}x{W}, N={N}, M={MAXI}, bin_tile={cfg.bin_tile}")
    for name, fn in stages:
        dt = timed(chain(fn), means, iters)
        print(f"{name:12s} {dt*1e3:8.2f} ms  (delta {1e3*(dt-prev):+8.2f} ms)")
        prev = dt


if __name__ == "__main__":
    main()
