#!/usr/bin/env python
"""Attribute the Pallas fwd/bwd kernel time by ablating pieces.

Compiles WRONG-MATH variants of the forward kernel (same shapes/loop
structure, one piece stubbed) and times each on the bench config. The
delta vs baseline attributes that piece's cost. Variants (monkeypatched):

  noexp      exp(power) -> 1 + power
  nolog1p    log1p(-abar) -> -abar
  noTexp     exp(logT + cum) -> logT + cum
  nomask     drop the 16px rect mask int ops
  nocumsum   cumsum matmuls -> identity (isolates MXU passes)
  allstub    all of the above (VPU floor: DMA + mults + accumulate)
  nomoment   (bwd only) moment matmuls -> zeros
  defmm      _matmul at DEFAULT precision (cost of HIGHEST's 6 passes in
             the cg/WS/acc matmuls)
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import freesurgs_tpu.ops.raster_pallas as rp


def timed(fn, x, iters=8):
    @jax.jit
    def many(x):
        def body(_, x):
            return x + 0.0 * fn(x)
        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(many(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(many(x))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def build_inputs():
    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.core.sh import sh_to_rgb_clamped
    from freesurgs_tpu.ops.projection import project_gaussians
    from freesurgs_tpu.ops.binning import derive_bin_rect

    H, W, N, MAXI = 1024, 1280, 100_000, 318_208
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
    sh = jnp.asarray(rng.normal(size=(N, 16, 3)).astype(np.float32) * 0.3)
    opac = jax.nn.sigmoid(logit_op)
    cfg = rp.RasterConfig(height=H, width=W, max_instances=MAXI,
                          interpret=False, bin_tile=32)
    proj = project_gaussians(means, jnp.exp(log_scales), quats, cam)
    proj_b = rp._prune_and_snug(proj, opac)
    bins = rp._bin_state(derive_bin_rect(proj_b, cfg.bin_scale), cfg)
    dirs = means / jnp.maximum(
        jnp.linalg.norm(means, axis=-1, keepdims=True), 1e-8)
    rgb = sh_to_rgb_clamped(3, sh, dirs)
    rgbz = jnp.concatenate([rgb, proj_b.depth[:, None]], 1)
    fields = rp._field_cols(proj_b.mean2d, proj_b.conic, rgbz, opac,
                            proj_b.tile_rect, cfg)
    feat, meta = rp._build_feat(fields, bins)
    out, keff = rp._run_fwd(feat, meta, cfg)
    return (jax.block_until_ready(feat), jax.block_until_ready(meta),
            jax.block_until_ready(keff), jax.block_until_ready(out), cfg)


STUBS = {}


def make_variant(name, noexp=False, nolog1p=False, noTexp=False,
                 nomask=False, nocumsum=False, nomoment=False, defmm=False):
    orig_alpha = rp._chunk_alpha
    orig_weights = rp._chunk_weights
    orig_cumsum = rp._cumsum_mm
    orig_moment = rp._moment_mm
    orig_matmul = rp._matmul

    def moment_mm(P_bf16, x):
        if nomoment:
            return jnp.zeros((6, x.shape[1]), jnp.float32)
        return orig_moment(P_bf16, x)

    def matmul(a, b, contract, precision=jax.lax.Precision.HIGHEST):
        if defmm:
            precision = jax.lax.Precision.DEFAULT
        return orig_matmul(a, b, contract, precision)

    def chunk_alpha(f, pixx, pixy, q16=None):
        mx, my = f[0:1, :], f[1:2, :]
        ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
        opacr = f[5:6, :]
        dx = mx - pixx
        dy = my - pixy
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        expp = (1.0 + power) if noexp else jnp.exp(power)
        raw = opacr * expp
        alpha = jnp.minimum(rp.ALPHA_MAX, raw)
        ok = (power <= 0.0) & (alpha >= rp.ALPHA_MIN)
        abar = jnp.where(ok, alpha, 0.0)
        if q16 is not None and not nomask:
            qx_hi, qy_hi, x16_lo, y16_lo = q16
            ri = jax.lax.bitcast_convert_type(f[10:11, :], jnp.int32)

            def in_x(v):
                return ((v >= (ri & 0xFF)) & (v < ((ri >> 16) & 0xFF))
                        ).astype(jnp.float32)

            def in_y(v):
                return ((v >= ((ri >> 8) & 0xFF))
                        & (v < ((ri >> 24) & 0xFF))).astype(jnp.float32)

            rect = (jnp.where(qx_hi, in_x(x16_lo + 1), in_x(x16_lo))
                    * jnp.where(qy_hi, in_y(y16_lo + 1), in_y(y16_lo)))
            abar = abar * rect
        return abar, raw, expp, dx, dy, ok

    def cumsum_mm(x, tri):
        if nocumsum:
            return x
        return orig_cumsum(x, tri)

    def chunk_weights(abar, log_T, done, tri):
        log1m = (-abar) if nolog1p else jnp.log1p(-abar)
        cum_incl = cumsum_mm(log1m, tri)
        cum_excl = cum_incl - log1m
        s = log_T + cum_excl
        T_pre = s if noTexp else jnp.exp(s)
        contributes = abar > 0
        crossed = contributes & (T_pre * (1.0 - abar) < rp.T_EPS)
        crossed_cum = rp._matmul(crossed.astype(jnp.float32), tri,
                                 ((1,), (0,)),
                                 precision=jax.lax.Precision.DEFAULT)
        valid = contributes & jnp.logical_not(done) & (crossed_cum < 0.5)
        w = jnp.where(valid, abar * T_pre, 0.0)
        new_log_T = log_T + jnp.sum(jnp.where(valid, log1m, 0.0), axis=1,
                                    keepdims=True)
        new_done = done | (jnp.max(crossed.astype(jnp.float32), axis=1,
                                   keepdims=True) > 0.0)
        return w, T_pre, valid, abar, new_log_T, new_done

    STUBS[name] = (chunk_alpha, chunk_weights, moment_mm, matmul,
                   cumsum_mm)


def main():
    feat, meta, keff, out, cfg = build_inputs()
    gout = jnp.ones_like(out)

    make_variant("baseline")
    make_variant("noexp", noexp=True)
    make_variant("nolog1p", nolog1p=True)
    make_variant("noTexp", noTexp=True)
    make_variant("nomask", nomask=True)
    make_variant("nocumsum", nocumsum=True)
    make_variant("nomoment", nomoment=True)
    make_variant("defmm", defmm=True)
    make_variant("allstub", noexp=True, nolog1p=True, noTexp=True,
                 nomask=True, nocumsum=True, nomoment=True, defmm=True)

    base_fwd = base_bwd = None
    for name, (ca, cw, cm, mm, cs) in STUBS.items():
        rp._chunk_alpha = ca
        rp._chunk_weights = cw
        rp._moment_mm = cm
        rp._matmul = mm
        rp._cumsum_mm = cs
        t_fwd = timed(lambda f: jnp.sum(rp._run_fwd(f, meta, cfg)[0]), feat)
        t_bwd = timed(
            lambda f: jnp.sum(rp._run_bwd(f, meta, keff, out, gout, cfg)),
            feat)
        if name == "baseline":
            base_fwd, base_bwd = t_fwd, t_bwd
            print(f"{name:10s} fwd {t_fwd:6.2f} ms   bwd {t_bwd:6.2f} ms")
        else:
            print(f"{name:10s} fwd {t_fwd:6.2f} ms ({t_fwd - base_fwd:+5.2f})"
                  f"   bwd {t_bwd:6.2f} ms ({t_bwd - base_bwd:+5.2f})")


if __name__ == "__main__":
    main()
