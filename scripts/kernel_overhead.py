#!/usr/bin/env python
"""Attribute the forward kernel's per-chunk overhead (ablation round 2).

kernel_ablate.py showed the fwd kernel's cost is NOT transcendentals or
MXU passes; the "allstub" floor (9.1 ms) implies ~2.3 us/chunk beyond
explainable VPU work. These variants isolate the candidates, each a
structural copy of _fwd_kernel with one mechanism removed (wrong math is
fine; shapes and loop structure preserved):

  nowatermark  no early-termination bookkeeping (no sum(done) per chunk,
               no keff SMEM writes, no keff branch wrapper)
  nocarryred   carry updates without the two axis-1 lane reductions
  nodma        single DMA up front, body reads buf[0] (no per-chunk
               wait/issue)
  minimal      all of the above: the true loop+VPU floor
"""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import freesurgs_tpu.ops.raster_pallas as rp
from freesurgs_tpu.ops.binning import CHUNK


def make_fwd(cfg, nowatermark=False, nocarryred=False, nodma=False):
    npix = cfg.npix
    grid_x, bin_tile = cfg.grid_x, cfg.bin_tile

    def kern(starts_ref, counts_ref, feat_hbm, out_ref, keff_ref, buf, sems,
             acc_s, logT_s, done_s):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        n_chunks = pl.cdiv(count, CHUNK)
        pixx, pixy, q16 = rp._tile_pixels(t, grid_x, bin_tile)
        tri = rp._tri_incl()
        acc_s[:, :] = jnp.zeros((npix, rp.N_OUT), jnp.float32)
        logT_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
        done_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
        keff_ref[t] = 0

        def get_dma(slot, k):
            off = pl.multiple_of(start + k * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot],
                sems.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()
            if nodma:
                get_dma(0, 0).wait()

        def compute(k):
            f = buf[0] if nodma else buf[k % 2]
            abar, _, _, _, _, _ = rp._chunk_alpha(f, pixx, pixy, q16)
            log1m = jnp.log1p(-abar)
            cum_incl = rp._cumsum_mm(log1m, tri)
            cum_excl = cum_incl - log1m
            T_pre = jnp.exp(logT_s[:, :] + cum_excl)
            contributes = abar > 0
            crossed = contributes & (T_pre * (1.0 - abar) < rp.T_EPS)
            crossed_cum = rp._matmul(crossed.astype(jnp.float32), tri,
                                     ((1,), (0,)),
                                     precision=jax.lax.Precision.DEFAULT)
            done = done_s[:, :] > 0.0
            valid = contributes & jnp.logical_not(done) & (crossed_cum < 0.5)
            w = jnp.where(valid, abar * T_pre, 0.0)
            if nocarryred:
                logT_s[:, :] += log1m[:, :1]
                done_f = done_s[:, :] + crossed_cum[:, :1]
            else:
                logT_s[:, :] += jnp.sum(jnp.where(valid, log1m, 0.0),
                                        axis=1, keepdims=True)
                done_f = (done | (jnp.max(crossed.astype(jnp.float32),
                                          axis=1, keepdims=True) > 0.0)
                          ).astype(jnp.float32)
            done_s[:, :] = done_f
            cf8 = rp._chunk_channels(f)
            acc_s[:, :] += rp._matmul(w, cf8, ((1,), (1,)))
            if not nowatermark:
                @pl.when(jnp.sum(done_f) >= float(npix))
                def _():
                    keff_ref[t] = k + 1

        def body(k, _):
            if not nodma:
                @pl.when(k + 1 < n_chunks)
                def _():
                    get_dma((k + 1) % 2, k + 1).start()

                get_dma(k % 2, k).wait()

            if nowatermark:
                compute(k)
            else:
                @pl.when(keff_ref[t] == 0)
                def _():
                    compute(k)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

        @pl.when(keff_ref[t] == 0)
        def _():
            keff_ref[t] = n_chunks

        out_ref[0, :, 0:6] = acc_s[:, 0:6]
        out_ref[0, :, 6:7] = jnp.exp(logT_s[:, :])
        out_ref[0, :, 7:8] = jnp.zeros((npix, 1), jnp.float32)

    def run(feat, meta):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cfg.num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, npix, rp.N_OUT),
                             lambda t, s, c: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cfg.num_tiles,), lambda t, s, c: (0,),
                             memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, rp.FEAT_DIM, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((npix, rp.N_OUT), jnp.float32),
                pltpu.VMEM((npix, 1), jnp.float32),
                pltpu.VMEM((npix, 1), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((cfg.num_tiles, npix, rp.N_OUT),
                                     jnp.float32),
                jax.ShapeDtypeStruct((cfg.num_tiles,), jnp.int32),
            ],
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=rp.VMEM_LIMIT),
        )(meta[:, 0], meta[:, 1], feat)

    return run


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


def main():
    from scripts.kernel_ablate import build_inputs
    feat, meta, keff, out, cfg = build_inputs()

    variants = [
        ("baseline", {}),
        ("nowatermark", dict(nowatermark=True)),
        ("nocarryred", dict(nocarryred=True)),
        ("nodma", dict(nodma=True)),
        ("minimal", dict(nowatermark=True, nocarryred=True, nodma=True)),
    ]
    base = None
    for name, kw in variants:
        run = make_fwd(cfg, **kw)
        t = timed(lambda f: jnp.sum(run(f, meta)[0]), feat)
        if base is None:
            base = t
            print(f"{name:12s} fwd {t:6.2f} ms")
        else:
            print(f"{name:12s} fwd {t:6.2f} ms ({t - base:+5.2f})")


if __name__ == "__main__":
    main()
