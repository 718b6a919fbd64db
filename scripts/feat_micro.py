#!/usr/bin/env python
"""Microbench: isolate the instance-field gather, the transpose, and the
raw Pallas kernels at the bench config (chained jitted loops, TPU)."""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=8):
    @jax.jit
    def many(x, *rest):
        def body(_, x):
            return x + 0.0 * fn(x, *rest)
        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(many(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(many(*args))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.core.sh import sh_to_rgb_clamped
    from freesurgs_tpu.ops.projection import project_gaussians
    from freesurgs_tpu.ops.binning import derive_bin_rect
    from freesurgs_tpu.ops.raster_pallas import (
        RasterConfig, _run_fwd, _run_bwd, _build_feat, _field_cols,
        _bin_state, _prune_and_snug)

    H, W, N, MAXI = 1024, 1280, 100_000, 318_208
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
                       interpret=False, bin_tile=32)

    proj = project_gaussians(means, scales, quats, cam)
    proj_b = _prune_and_snug(proj, opac)
    bins = _bin_state(derive_bin_rect(proj_b, cfg.bin_scale), cfg)
    bins = jax.tree.map(jnp.asarray, bins)
    dirs = means / jnp.maximum(
        jnp.linalg.norm(means, axis=-1, keepdims=True), 1e-8)
    rgb = sh_to_rgb_clamped(sh_deg, sh, dirs)
    rgbz = jnp.concatenate([rgb, proj_b.depth[:, None]], 1)
    fields = _field_cols(proj_b.mean2d, proj_b.conic, rgbz, opac,
                         proj_b.tile_rect, cfg)           # (N, 11)
    fields = jax.block_until_ready(fields)
    nf = fields.shape[1]
    src = jnp.concatenate(
        [fields, jnp.zeros((N, 16 - nf), jnp.float32)], axis=1)
    src = jnp.concatenate([src, jnp.zeros((1, 16), jnp.float32)], axis=0)
    gidx = bins.gather_idx

    print(f"m={MAXI}, raw instances={int(bins.num_instances)}")

    t = timed(lambda s: jnp.sum(s[gidx]), src)
    print(f"row gather (m,16):            {t:7.2f} ms")
    t = timed(lambda s: jnp.sum(s[gidx] * 2.0), src)
    print(f"row gather + elementwise:     {t:7.2f} ms")
    gathered = jax.block_until_ready(src[gidx])
    t = timed(lambda g: jnp.sum(g.T), gathered)
    print(f"transpose (m,16)->(16,m):     {t:7.2f} ms")
    t = timed(lambda s: jnp.sum(s[gidx].T), src)
    print(f"gather + transpose (fused?):  {t:7.2f} ms")

    feat, meta = _build_feat(fields, bins)
    feat = jax.block_until_ready(feat)
    meta = jax.block_until_ready(meta)

    t = timed(lambda f: jnp.sum(_run_fwd(f, meta, cfg)[0]), feat)
    print(f"pallas FWD kernel alone:      {t:7.2f} ms")

    out, keff = _run_fwd(feat, meta, cfg)
    out = jax.block_until_ready(out)
    keff = jax.block_until_ready(keff)
    gout = jnp.ones_like(out)

    t = timed(lambda f: jnp.sum(_run_bwd(f, meta, keff, out, gout, cfg)),
              feat)
    print(f"pallas BWD kernel alone:      {t:7.2f} ms")

    # the backward gaussian reduction (BinAux path) alone
    dfeat = jax.block_until_ready(_run_bwd(feat, meta, keff, out, gout, cfg))

    def reduction(df):
        dpad = jnp.concatenate(
            [df[:10].T, jnp.zeros((1, 10), jnp.float32)], axis=0)
        pre = dpad[bins.pos]
        csum = jnp.concatenate(
            [jnp.zeros((1, 10), jnp.float32),
             jnp.cumsum(pre, axis=0)], axis=0)
        return jnp.sum(csum[bins.seg_hi] - csum[bins.seg_lo])

    t = timed(reduction, dfeat)
    print(f"bwd gaussian reduction alone: {t:7.2f} ms")


if __name__ == "__main__":
    main()
