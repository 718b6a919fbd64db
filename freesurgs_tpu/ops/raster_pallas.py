"""Pallas TPU tile-compositing kernels for 3D Gaussian Splatting.

TPU-native replacement for the CUDA per-tile forward/backward rasterizer
(reference native component N1, SURVEY.md section 2.1). Design departures
from the CUDA kernel, chosen for TPU hardware:

- The sequential per-pixel front-to-back blend loop becomes a closed-form
  computation in log-transmittance space: per chunk of ``CHUNK`` instances,
  alphas for all tile pixels are evaluated at once on the VPU
  (pixels on sublanes, instances on lanes), prefix transmittances come from
  a triangular matmul on the MXU (a (npix, CHUNK) @ (CHUNK, CHUNK) cumsum),
  and channel accumulation is another MXU matmul. See ``ops/oracle.py`` for
  the algebra and the CUDA-parity stopping semantics; both implementations
  share it, so oracle == pallas to float reassociation.

- One fused pass renders 6 channels [r, g, b, z, silhouette, z^2] plus the
  final transmittance, replacing the reference's *two* rasterizer calls per
  render (``gaussian_renderer/__init__.py:68-69``).

- The backward pass needs no back-to-front traversal: with the saved
  forward totals, suffix sums are (total - prefix), again cumsum matmuls.
  Gradients to camera poses happen outside these kernels via jnp autodiff
  through the projection stage.

- ``bin_tile=32``: instances are binned at 32x32-pixel granularity (2-3x
  fewer duplicated instances — instance count, not kernel FLOPs, is the
  TPU bottleneck) while each pixel masks contributions against the
  original 16px tile rect carried in the instance record, reproducing the
  CUDA 16x16 binning semantics EXACTLY (a gaussian's 16-rect containing a
  pixel's 16-tile implies membership in the enclosing 32-tile's bin).

Instance data is struct-of-arrays ``feat[16, M]`` (fields x instances), with
per-tile runs CHUNK-aligned by the binner so every DMA is a lane-aligned
(16, CHUNK) block and every tile's backward writes are disjoint. Field rows:
  0 mean2d.x | 1 mean2d.y | 2 conic.a | 3 conic.b | 4 conic.c | 5 opacity
  6 r | 7 g | 8 b | 9 z | (bin_tile>16: 10 = 16px tile rect byte-packed
  tx0|ty0<<8|tx1<<16|ty1<<24, bitcast to f32) | rest zero padding
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, build_tile_bins, derive_bin_rect
from .binning_fast import build_tile_bins_fast
from .oracle import ALPHA_MAX, ALPHA_MIN, T_EPS
from .projection import TILE, ProjectedGaussians

N_OUT = 8            # [r, g, b, z, sil, z^2, T_final, unused]
FEAT_DIM = 16

# Scoped-VMEM ceiling for the kernels. At bin_tile=32 the backward body
# holds ~15 live (1024, CHUNK) f32 temporaries (~8 MB) plus the forward
# recompute, overflowing XLA's default 16 MB scoped-vmem guardrail
# (observed: 18.8 MB needed). v5e has 128 MB physical VMEM; block buffers
# here are < 1 MB, so 64 MB of scoped headroom is safe.
VMEM_LIMIT = 64 * 1024 * 1024


class RasterConfig(NamedTuple):
    height: int
    width: int
    max_instances: int
    interpret: bool
    fast_binning: bool = True   # sort-free hierarchical binning (identical
                                # layout; see ops/binning_fast.py)
    bin_tile: int = 16          # binning granularity (16 or 32 px); 32 bins
                                # coarser + masks per pixel with the 16px
                                # rect — exact CUDA semantics, fewer
                                # instances (see module docstring)

    @property
    def bin_scale(self) -> int:
        assert self.bin_tile % TILE == 0
        return self.bin_tile // TILE

    @property
    def npix(self) -> int:
        return self.bin_tile * self.bin_tile

    @property
    def grid_x(self) -> int:
        return -(-self.width // self.bin_tile)

    @property
    def grid_y(self) -> int:
        return -(-self.height // self.bin_tile)

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y


def _tri_incl(dtype=jnp.float32):
    """(CHUNK, CHUNK) mask with U[j, i] = (j <= i): x @ U == cumsum(x)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (row <= col).astype(dtype)


def _tile_pixels(t, grid_x, bin_tile):
    """Per-pixel/quadrant data of tile t (row-major pixel order).

    Returns (pixx, pixy, q16) with pixx/pixy (npix, 1) f32 pixel coords
    and q16 the rect-mask helper for bin_tile > 16: the pixel's 16px-tile
    coordinate takes only ``bin_scale`` distinct values per axis, so the
    rect compares can run at quadrant granularity ((1, C) rows) and be
    blended per pixel with one select per axis instead of full-size int
    compares (measured ~2.3 ms/kernel at the bench config —
    scripts/kernel_ablate.py "nomask"). q16 = (qx_hi, qy_hi, x16_lo,
    y16_lo): boolean (npix, 1) "pixel is in the high quadrant half" masks
    plus the LOW quadrant's scalar 16px-tile coords.
    """
    npix = bin_tile * bin_tile
    ty = t // grid_x
    tx = t % grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    ix = tx * bin_tile + p % bin_tile
    iy = ty * bin_tile + p // bin_tile
    if bin_tile > TILE:
        assert bin_tile == 2 * TILE, "quadrant mask assumes bin_scale == 2"
        qx_hi = (p % bin_tile) >= TILE
        qy_hi = (p // bin_tile) >= TILE
        q16 = (qx_hi, qy_hi, 2 * tx, 2 * ty)
    else:
        q16 = None
    return ix.astype(jnp.float32), iy.astype(jnp.float32), q16


def _matmul(a, b, contract, precision=jax.lax.Precision.HIGHEST):
    # HIGHEST (6 bf16 passes ~ true f32): the default TPU matmul precision
    # truncates operands to bf16, which is catastrophic for the
    # log-transmittance cumsums (values up to ~|log(1-0.99)| * chunk).
    # Callers pass DEFAULT (1 pass) where both operands are exact in bf16
    # (crossed @ tri: 0/1 values, integer sums <= CHUNK, exact in the f32
    # accumulator). Mosaic supports only DEFAULT/HIGHEST, so the
    # intermediate case lives in _cumsum_mm below.
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _split3(x):
    """3-term bf16 split: hi + mid + lo reproduces f32 ``x`` to ~2^-24
    relative (each term carries ~8 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _cumsum_mm(x, tri):
    """Lane cumsum of f32 ``x`` via THREE bf16 MXU passes (vs HIGHEST's 6).

    ``tri`` is a 0/1 mask — EXACT in bf16 — so the only error is the
    split residual of ``x``: each bf16 term carries ~8 mantissa bits, so
    hi+mid+lo reproduces x to ~2^-24 relative (true f32; a 2-term split
    leaves ~2^-16 and measurably perturbs pose gradients). All passes
    accumulate in f32 on the MXU.

    Measured dead end (round 3): folding the three passes into ONE
    depth-3C pass by concatenating [hi mid lo] along lanes made both
    kernels SLOWER (fwd 11.5 -> 15.3 ms, bwd 17.8 -> 21.4 ms at the
    bench config) — the concat materializes full-size copies whose VPU
    write cost exceeds the saved MXU issue latency. Keep the 3-pass form.
    """
    hi, mid, lo = _split3(x)
    trib = tri.astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(a, trib, ((((1,), (0,))), ((), ())),
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)

    return mm(hi) + mm(mid) + mm(lo)


def _chunk_alpha(f, pixx, pixy, q16=None):
    """Per-chunk alpha evaluation shared by fwd/bwd.

    f: (FEAT_DIM, CHUNK) block. Returns (npix, CHUNK) arrays.
    Padding slots have opacity 0, hence abar 0 — no masking needed.
    q16 non-None => mask against the 16px rect in row 10 (bin_tile > 16
    mode). The pixel's 16px-tile coordinate is constant per 16x16
    quadrant, so the 8 rect compares run on (1, C) rows and only the
    per-axis quadrant BLEND touches full (npix, C) arrays (2 selects +
    1 and, vs 4 compares + 3 ands + index construction before).
    """
    mx, my = f[0:1, :], f[1:2, :]
    ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
    opac = f[5:6, :]
    dx = mx - pixx          # (npix, CHUNK) via broadcast
    dy = my - pixy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    raw = opac * expp
    alpha = jnp.minimum(ALPHA_MAX, raw)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    abar = jnp.where(ok, alpha, 0.0)
    if q16 is not None:
        qx_hi, qy_hi, x16_lo, y16_lo = q16
        ri = jax.lax.bitcast_convert_type(f[10:11, :], jnp.int32)
        # (1, C) per-quadrant rect tests (lo/hi 16px-tile per axis), as
        # exact {0, 1} f32 so the per-pixel blend is selects + one
        # multiply (Mosaic cannot select between i1 vectors); abar * 1.0
        # == abar and abar * 0.0 == 0.0 make this bit-identical to a
        # boolean mask.
        def in_x(v):
            return ((v >= (ri & 0xFF)) & (v < ((ri >> 16) & 0xFF))
                    ).astype(jnp.float32)

        def in_y(v):
            return ((v >= ((ri >> 8) & 0xFF)) & (v < ((ri >> 24) & 0xFF))
                    ).astype(jnp.float32)

        rect = (jnp.where(qx_hi, in_x(x16_lo + 1), in_x(x16_lo))
                * jnp.where(qy_hi, in_y(y16_lo + 1), in_y(y16_lo)))
        abar = abar * rect
    return abar, raw, expp, dx, dy, ok


def _chunk_weights(abar, log_T, done, tri):
    """Compositing weights + carry updates for one chunk (see oracle.py).

    abar: (npix, CHUNK); log_T, done: (npix, 1) carries.
    """
    log1m = jnp.log1p(-abar)
    cum_incl = _cumsum_mm(log1m, tri)
    cum_excl = cum_incl - log1m
    T_pre = jnp.exp(log_T + cum_excl)
    contributes = abar > 0
    crossed = contributes & (T_pre * (1.0 - abar) < T_EPS)
    crossed_cum = _matmul(crossed.astype(jnp.float32), tri, ((1,), (0,)),
                          precision=jax.lax.Precision.DEFAULT)
    valid = contributes & jnp.logical_not(done) & (crossed_cum < 0.5)
    w = jnp.where(valid, abar * T_pre, 0.0)
    new_log_T = log_T + jnp.sum(jnp.where(valid, log1m, 0.0), axis=1,
                                keepdims=True)
    new_done = done | (jnp.max(crossed.astype(jnp.float32), axis=1,
                               keepdims=True) > 0.0)
    return w, T_pre, valid, abar, new_log_T, new_done


def _pixel_basis(pixx, pixy, t, grid_x, bin_tile):
    """Static per-tile moment basis P = [1, rx, ry, rx^2, rx*ry, ry^2]
    (npix, 6), with rx/ry tile-CENTER-relative pixel coords — integers in
    [-bin_tile/2, bin_tile/2), so every entry is EXACT in bf16: |rx| <=
    16, hence |rx^2|, |rx*ry| <= 256, and every integer of magnitude
    <= 256 fits bf16's 8 mantissa bits. (Tile-ORIGIN-relative coords
    would break at bin_tile=32: 31^2 = 961 needs 10 bits.)

    Also returns the (ox, oy) origin so callers can shift per-instance
    centers into the same frame. The relative frame is what makes the
    moment recombination numerically safe: |px_rel| is bounded by the
    instance's own tile reach (~3.3 sigma + bin_tile), so the usual
    raw-coordinate cancellation (px^2 ~ 1e6 swamping dx^2 ~ 1) never
    appears."""
    half = bin_tile // 2
    ox = jnp.float32((t % grid_x) * bin_tile + half)
    oy = jnp.float32((t // grid_x) * bin_tile + half)
    rx = pixx - ox
    ry = pixy - oy
    one = jnp.ones_like(rx)
    P = jnp.concatenate([one, rx, ry, rx * rx, rx * ry, ry * ry], axis=1)
    return P.astype(jnp.bfloat16), ox, oy


def _moment_mm(P_bf16, x):
    """S[j, c] = sum_p P[p, j] * x[p, c] on the MXU, f32-true.

    P is exact in bf16 (see _pixel_basis); only ``x`` needs the 3-term
    bf16 split, so three DEFAULT passes reproduce the f32 contraction to
    ~2^-24 relative (same scheme as _cumsum_mm). These three tiny
    matmuls cost ~5.9 ms of the 17.8 ms backward kernel (kernel_ablate)
    — but the one-pass concat-along-contraction rewrite measured SLOWER
    (copy cost > issue latency; see _cumsum_mm), so 3 passes stand."""
    hi, mid, lo = _split3(x)

    def mm(a):
        return jax.lax.dot_general(P_bf16, a, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)

    return mm(hi) + mm(mid) + mm(lo)


def _chunk_channels(f):
    """(N_OUT, CHUNK) channel value rows [r, g, b, z, 1, z^2, 0, 0]."""
    z = f[9:10, :]
    ones = jnp.ones_like(z)
    zeros = jnp.zeros_like(z)
    return jnp.concatenate(
        [f[6:7, :], f[7:8, :], f[8:9, :], z, ones, z * z, zeros, zeros],
        axis=0)


# ---------------------------------------------------------------- forward

def _fwd_kernel(grid_x: int, bin_tile: int, starts_ref, counts_ref, feat_hbm,
                out_ref, keff_ref, buf, sems, acc_s, logT_s, done_s):
    npix = bin_tile * bin_tile
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    n_chunks = pl.cdiv(count, CHUNK)
    pixx, pixy, q16 = _tile_pixels(t, grid_x, bin_tile)
    tri = _tri_incl()

    # Accumulators live in VMEM scratch (persisting vreg loop carries is
    # brittle under Mosaic layout legalization); scratch persists across
    # grid steps, so reset explicitly.
    acc_s[:, :] = jnp.zeros((npix, N_OUT), jnp.float32)
    logT_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
    done_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
    # Early-termination watermark (CUDA parity: a per-tile loop break once
    # every pixel crossed the T_EPS transmittance cutoff — exact, since
    # later instances have valid == False, contributing zero value and
    # zero gradient). 0 means "still compositing"; fixed up after the loop.
    # The output is one whole-array SMEM block (constant index map): Mosaic
    # requires rank-1 blocks to cover the array, and the sequential TPU
    # grid makes per-program element writes race-free.
    keff_ref[t] = 0

    def get_dma(slot, k):
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()

        @pl.when(keff_ref[t] == 0)
        def _():
            f = buf[slot]
            abar, _, _, _, _, _ = _chunk_alpha(f, pixx, pixy, q16)
            w, _, _, _, log_T, done = _chunk_weights(
                abar, logT_s[:, :], done_s[:, :] > 0.0, tri)
            cf8 = _chunk_channels(f)                      # (N_OUT, CHUNK)
            acc_s[:, :] += _matmul(w, cf8, ((1,), (1,)))  # (npix, N_OUT)
            logT_s[:, :] = log_T
            done_f = done.astype(jnp.float32)
            done_s[:, :] = done_f

            @pl.when(jnp.sum(done_f) >= float(npix))
            def _():
                keff_ref[t] = k + 1

        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(keff_ref[t] == 0)
    def _():
        keff_ref[t] = n_chunks

    out_ref[0, :, 0:6] = acc_s[:, 0:6]
    out_ref[0, :, 6:7] = jnp.exp(logT_s[:, :])
    out_ref[0, :, 7:8] = jnp.zeros((npix, 1), jnp.float32)


def _run_fwd(feat, meta, cfg: RasterConfig):
    npix = cfg.npix
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, npix, N_OUT),
                         lambda t, starts, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.num_tiles,), lambda t, starts, counts: (0,),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((npix, N_OUT), jnp.float32),
            pltpu.VMEM((npix, 1), jnp.float32),
            pltpu.VMEM((npix, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg.grid_x, cfg.bin_tile),
        out_shape=[
            jax.ShapeDtypeStruct((cfg.num_tiles, npix, N_OUT), jnp.float32),
            jax.ShapeDtypeStruct((cfg.num_tiles,), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(meta[:, 0], meta[:, 1], feat)


# --------------------------------------------------------------- backward

def _bwd_kernel(grid_x: int, bin_tile: int, starts_ref, counts_ref, keff_ref,
                feat_hbm, out_saved_ref, gout_ref, dfeat_hbm, buf, dbuf,
                sems, wsems, logT_s, done_s, gcarry_s):
    npix = bin_tile * bin_tile
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    n_chunks = pl.cdiv(count, CHUNK)
    keff = keff_ref[t]   # chunks the forward composited (early termination)
    pixx, pixy, q16 = _tile_pixels(t, grid_x, bin_tile)
    tri = _tri_incl()
    Pb, ox, oy = _pixel_basis(pixx, pixy, t, grid_x, bin_tile)

    g8 = gout_ref[0]                      # (npix, N_OUT)
    out8 = out_saved_ref[0]
    g_T = g8[:, 6:7]
    T_fin = out8[:, 6:7]
    # sum_ch g_ch * total_ch over the 6 real channels
    t0 = jnp.sum(g8[:, 0:6] * out8[:, 0:6], axis=1, keepdims=True)

    def get_dma(slot, k):
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot], sems.at[slot])

    def put_dma(slot, k):
        # dfeat keeps the (FEAT_DIM, M) fields-major layout: Mosaic
        # lane-pads any (M, 16) array to (M, 128) — even in HBM — making
        # 16-lane DMA slices illegal ("slice shape along dimension 1 must
        # be aligned to tiling (128)"), so a transposed store layout is
        # not expressible without 8x padded traffic + per-chunk (128,128)
        # transposes that cost more than the XLA-side transpose they'd
        # replace.
        off = pl.multiple_of(start + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            dbuf.at[slot], dfeat_hbm.at[:, pl.ds(off, CHUNK)],
            wsems.at[slot])

    @pl.when(keff > 0)
    def _():
        get_dma(0, 0).start()

    logT_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
    done_s[:, :] = jnp.zeros((npix, 1), jnp.float32)
    gcarry_s[:, :] = jnp.zeros((npix, 1), jnp.float32)

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < keff)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        # Double-buffered store: wait only for the write issued two
        # iterations ago from this slot, so the DMA overlaps the next
        # chunk's compute (VERDICT round-1 weak item 8).
        @pl.when(k >= 2)
        def _():
            put_dma(slot, k - 2).wait()

        @pl.when(k < keff)
        def _():
            get_dma(slot, k).wait()
            f = buf[slot]
            abar, raw, expp, dx, dy, _ = _chunk_alpha(f, pixx, pixy, q16)
            w, T_pre, valid, abar, log_T, done = _chunk_weights(
                abar, logT_s[:, :], done_s[:, :] > 0.0, tri)
            logT_s[:, :] = log_T
            done_s[:, :] = done.astype(jnp.float32)
            cf8 = _chunk_channels(f)                        # (N_OUT, CHUNK)
            # cg[p, i] = sum_ch c_i_ch g_ch_p. Keep the HIGHEST matmul:
            # 6 VPU outer-product FMAs measured SLOWER overall (23.0 vs
            # 23.7 Mpix/s headline) — the MXU passes overlap VPU work,
            # while extra VPU ops sit on the critical path.
            cg = _matmul(g8, cf8, ((1,), (0,)))             # (npix, CHUNK)
            wcg = w * cg
            cum_wcg = _cumsum_mm(wcg, tri)
            gS = t0 - gcarry_s[:, :] - cum_wcg
            denom = 1.0 - abar
            dalpha = jnp.where(valid,
                               cg * T_pre - (gS + g_T * T_fin) / denom, 0.0)
            opac = f[5:6, :]
            clamp_ok = (raw < ALPHA_MAX).astype(jnp.float32)
            dG = dalpha * opac * clamp_ok
            dpow = dG * expp
            ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]

            # Moment reductions on the MXU: every per-instance gradient
            # that was psum(dpow * poly(dx, dy)) factors through SIX
            # tile-static moments S = P^T dpow (P = [1, rx, ry, rx^2,
            # rx ry, ry^2], exact in bf16), then (1, CHUNK) lane
            # recombination about the instance center — replacing ~10
            # full-size VPU products/reductions with one 3-pass matmul.
            # dx = px_rel - rx, so e.g. sum dpow dx^2 =
            #   px_rel^2 s0 - 2 px_rel sx + sxx.
            S = _moment_mm(Pb, dpow)                       # (6, CHUNK)
            s0, sx, sy = S[0:1, :], S[1:2, :], S[2:3, :]
            sxx, sxy, syy = S[3:4, :], S[4:5, :], S[5:6, :]
            pxr = f[0:1, :] - ox
            pyr = f[1:2, :] - oy
            r1 = pxr * s0 - sx
            r2 = pyr * s0 - sy
            ra = pxr * pxr * s0 - 2.0 * pxr * sx + sxx
            rb = pxr * pyr * s0 - pxr * sy - pyr * sx + sxy
            rc = pyr * pyr * s0 - 2.0 * pyr * sy + syy
            dmx = -(ca * r1 + cb * r2)
            dmy = -(cc * r2 + cb * r1)
            dA = -0.5 * ra
            dB = -rb
            dC = -0.5 * rc
            # dpow == (dalpha * expp * clamp_ok) * opac, with opac constant
            # per instance, so dop = s0 / opac (0 where opac == 0: padding
            # slots have dpow identically 0).
            dop = jnp.where(opac > 0.0, s0 / jnp.maximum(opac, 1e-30), 0.0)
            # Channel gradients likewise: WS[j] = sum_p g8[p, j] w[p, c]
            WS = _matmul(g8, w, ((0,), (0,)))              # (8, CHUNK)
            dr, dg, db = WS[0:1, :], WS[1:2, :], WS[2:3, :]
            z = f[9:10, :]
            dz = WS[3:4, :] + (2.0 * z) * WS[5:6, :]
            zero = jnp.zeros_like(dmx)
            dout = jnp.concatenate(
                [dmx, dmy, dA, dB, dC, dop, dr, dg, db, dz,
                 zero, zero, zero, zero, zero, zero],
                axis=0)  # (FEAT_DIM, CHUNK)
            dbuf[slot] = dout
            gcarry_s[:, :] += jnp.sum(wcg, axis=1, keepdims=True)

        # Chunks the forward never composited (all pixels crossed the
        # transmittance cutoff): every gradient is exactly zero, but the
        # slots are real instances, so zeros must be WRITTEN (the HBM
        # buffer is uninitialized).
        @pl.when(k >= keff)
        def _():
            dbuf[slot] = jnp.zeros((FEAT_DIM, CHUNK), jnp.float32)

        put_dma(slot, k).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    # Drain outstanding stores before the next grid step reuses dbuf.
    @pl.when(n_chunks >= 2)
    def _():
        put_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        put_dma((n_chunks - 1) % 2, n_chunks - 1).wait()


def _run_bwd(feat, meta, keff, out_saved, gout, cfg: RasterConfig):
    npix = cfg.npix
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cfg.num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, npix, N_OUT),
                         lambda t, starts, counts, keff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npix, N_OUT),
                         lambda t, starts, counts, keff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, CHUNK), jnp.float32),
            pltpu.VMEM((2, FEAT_DIM, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((npix, 1), jnp.float32),
            pltpu.VMEM((npix, 1), jnp.float32),
            pltpu.VMEM((npix, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg.grid_x, cfg.bin_tile),
        out_shape=jax.ShapeDtypeStruct(feat.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=VMEM_LIMIT),
    )(meta[:, 0], meta[:, 1], keff, feat, out_saved, gout)


# ----------------------------------------------------- custom_vjp wrapper

def _field_cols(mean2d, conic, rgbz, opacity, rect16, cfg: RasterConfig):
    """Per-Gaussian instance field columns (struct layout above)."""
    cols = [mean2d, conic, opacity[:, None], rgbz]
    if cfg.bin_scale > 1:
        # 16px-grid coords fit a byte each up to 4080px images.
        assert max(cfg.width, cfg.height) <= 255 * TILE
        packed = (rect16[:, 0] | (rect16[:, 1] << 8) | (rect16[:, 2] << 16)
                  | (rect16[:, 3] << 24)).astype(jnp.int32)
        cols.append(jax.lax.bitcast_convert_type(packed, jnp.float32)[:, None])
    return jnp.concatenate(cols, axis=1)


def _build_feat(fields, bins):
    """Gather per-instance field rows + tile meta.

    One (M, 16) row gather + transpose (~7 ms at M=393k) — measured
    FASTER than scattering 10 field columns by instance position inside
    the binner (~21 ms): every M-sized random-access pass costs the same
    ~15 ns/element floor, so the winning layout is the one with the
    fewest passes (scripts/binning_exp.py).

    The unwritten-slot story for backward: every slot in [0, M) belongs to
    exactly one tile's padded run (runs are CHUNK-aligned and consecutive),
    except the tail after the last tile's run — those slots keep gather_idx
    == n, whose segment is discarded, so uninitialized dfeat there is
    harmless.
    """
    n, nf = fields.shape
    src = jnp.concatenate(
        [fields, jnp.zeros((n, FEAT_DIM - nf), fields.dtype)], axis=1)
    src = jnp.concatenate([src, jnp.zeros((1, FEAT_DIM), src.dtype)], axis=0)
    feat = src[bins.gather_idx].T                                # (16, M)
    meta = jnp.stack([bins.tile_start, bins.tile_count], axis=1)
    return feat, meta


class BinState(NamedTuple):
    """A tile-binning layout, reusable across rasterize calls.

    Produced by ``compute_bin_state`` (or internally on every fresh
    rasterize). Carrying it across optimizer iterations amortizes the
    binning stage — the dominant non-kernel cost (BASELINE.md) — under
    this exactness contract (requires ``bin_tile > 16`` masked mode):

    - Pixel membership is enforced IN-KERNEL against the *fresh* 16px
      snug rect and the fresh alpha cutoff, both regathered every call:
      stale instances whose Gaussian moved away / faded / was pruned
      contribute exactly zero value and zero gradient.
    - A Gaussian that grew or moved BEYOND its binned coverage
      (``bin_rect``) loses the uncovered sliver until the next rebin —
      the only approximation. The reference rebins every iteration
      (CUDA duplicate+sort); ``rebin_every=1`` reproduces that exactly.
    - Gradients are the exact VJP of the stale-bin forward (the
      custom_vjp below consumes the same layout), so optimization under
      reuse remains well-posed.
    - After densification/pruning a slot may hold a DIFFERENT Gaussian:
      callers must force a rebin after any slot surgery (the training
      loops do; see train/steps.py).
    """
    gather_idx: jnp.ndarray     # (M,) slot -> gaussian index (n = padding)
    tile_start: jnp.ndarray     # (T,) CHUNK-aligned run starts
    tile_count: jnp.ndarray     # (T,) real instances per tile
    num_instances: jnp.ndarray  # () kept instances at bin time
    overflow: jnp.ndarray       # () dropped at bin time
    pos: jnp.ndarray            # (M,) pre-slot -> layout pos (fast binning)
    seg_lo: jnp.ndarray         # (N,) gaussian -> first pre-slot (clamped)
    seg_hi: jnp.ndarray         # (N,) gaussian -> one-past-last pre-slot
    bin_rect: jnp.ndarray       # (N, 4) coarse bin rect at bin time


def _bin_state(projb: ProjectedGaussians, cfg: RasterConfig) -> BinState:
    """Bin at coarse granularity (projb already pruned+snugged+derived)."""
    if cfg.fast_binning:
        bins, aux = build_tile_bins_fast(projb, cfg.grid_x, cfg.grid_y,
                                         cfg.max_instances, return_aux=True)
        pos, seg_lo, seg_hi = aux.pos, aux.seg_lo, aux.seg_hi
    else:
        bins = build_tile_bins(projb, cfg.grid_x, cfg.grid_y,
                               cfg.max_instances)
        pos = seg_lo = seg_hi = jnp.zeros((0,), jnp.int32)
    return BinState(bins.gather_idx, bins.tile_start, bins.tile_count,
                    bins.num_instances, bins.overflow,
                    pos, seg_lo, seg_hi, projb.tile_rect)


def compute_bin_state(proj: ProjectedGaussians, opacity: jnp.ndarray,
                      cfg: RasterConfig) -> BinState:
    """Build a reusable binning layout from raw projections (applies the
    same opacity pre-prune + snug rects as ``rasterize_pallas``)."""
    projb = derive_bin_rect(_prune_and_snug(proj, opacity), cfg.bin_scale)
    return _bin_state(projb, cfg)


def zero_bin_state(n: int, cfg: RasterConfig) -> BinState:
    """An empty (renders-nothing) BinState with the right shapes — a loop
    carry initializer for callers that force a rebin on iteration 0."""
    m = cfg.max_instances
    zi = jnp.zeros
    naux = m if cfg.fast_binning else 0
    return BinState(jnp.full((m,), n, jnp.int32),
                    zi((cfg.num_tiles,), jnp.int32),
                    zi((cfg.num_tiles,), jnp.int32),
                    jnp.int32(0), jnp.int32(0),
                    jnp.full((naux,), m, jnp.int32),
                    zi((n if cfg.fast_binning else 0,), jnp.int32),
                    zi((n if cfg.fast_binning else 0,), jnp.int32),
                    zi((n, 4), jnp.int32))


@functools.lru_cache(maxsize=32)
def _make_composite(cfg: RasterConfig):
    """Build the custom_vjp compositing function for a static config.

    Binning happens OUTSIDE the vjp boundary (it is gradient-free: depth
    order and integer rects carry no tangents, matching the CUDA
    duplicate+sort stage) so a precomputed ``BinState`` can be reused
    across calls.
    """

    @jax.custom_vjp
    def composite(mean2d, conic, rgbz, opacity, rect16, bins):
        out, _ = _composite_fwd(mean2d, conic, rgbz, opacity, rect16, bins)
        return out

    def _composite_fwd(mean2d, conic, rgbz, opacity, rect16, bins):
        fields = _field_cols(mean2d, conic, rgbz, opacity, rect16, cfg)
        feat, meta = _build_feat(fields, bins)
        out, keff = _run_fwd(feat, meta, cfg)
        res = (feat, meta, keff, bins, out, mean2d.shape[0])
        return out, res

    def _composite_bwd(res, gout):
        feat, meta, keff, bins, out_saved, n = res
        dfeat = _run_bwd(feat, meta, keff, out_saved, gout, cfg)
        if cfg.fast_binning:
            aux = bins
            # Contiguous-run segment reduction (see BinAux): in pre-slot
            # (depth-major expansion) order every gaussian's instances are
            # contiguous, so the per-gaussian sum is ONE (M, 10) row
            # gather by ``pos`` + a cumsum + two N-row prefix lookups —
            # fewer M-sized random-access passes than 10 per-column
            # scatter-adds (~21 ms at M=393k; each M-sized pass costs the
            # same ~15 ns/element floor). Rows 10+ of dfeat carry no
            # gradient (rect mask is a hard cutoff, like CUDA binning).
            # seg_lo/seg_hi are already clamped AND in original gaussian
            # order (unscrambled once at bin time), so the per-call tail
            # is exactly two N-row gathers into the fresh prefix sums.
            dpad = jnp.concatenate(
                [dfeat[:10].T, jnp.zeros((1, 10), jnp.float32)], axis=0)
            pre = dpad[aux.pos]                       # (M, 10) pre-slot
            csum = jnp.concatenate(
                [jnp.zeros((1, 10), jnp.float32),
                 jnp.cumsum(pre, axis=0)], axis=0)    # (M+1, 10)
            dsrc = csum[aux.seg_hi] - csum[aux.seg_lo]  # (n, 10)
        else:
            # Column-wise 1-D segment sums: a single (M, 16) row-windowed
            # scatter-add serializes in the TPU lowering (orders of
            # magnitude slower); per-column scatter-adds are ~free.
            cols = [jnp.zeros((n + 1,), jnp.float32).at[bins.gather_idx]
                    .add(dfeat[k], mode="drop")[:n] for k in range(10)]
            dsrc = jnp.stack(cols, axis=1)            # (n, 10)
        f0 = jax.dtypes.float0
        zi = lambda x: np.zeros(x.shape, f0)  # noqa: E731
        dbins = jax.tree.map(zi, bins)
        return (dsrc[:, 0:2], dsrc[:, 2:5], dsrc[:, 6:10], dsrc[:, 5],
                zi(jnp.zeros((n, 4), jnp.int32)),     # rect16: hard cutoff
                dbins)

    composite.defvjp(_composite_fwd, _composite_bwd)
    return composite


def snug_tile_rect(proj: ProjectedGaussians, opacity: jnp.ndarray
                   ) -> ProjectedGaussians:
    """Shrink tile rects to the bounding box of {alpha >= 1/255} — exact.

    The CUDA binner uses the axis-aligned box of the circumscribed
    3*sqrt(lambda_max) circle (``projection.py``); but a pixel only ever
    composites when ``alpha = opac * exp(-Q/2) >= ALPHA_MIN``, i.e. inside
    the ellipse ``Q <= 2t`` with ``t = log(255 * opac)``. The tight
    axis-aligned bounds of that ellipse follow from the conic (A, B, C)
    directly: ``|dx| <= sqrt(2t * C / (AC - B^2)) = sqrt(2t * cov_xx)`` and
    symmetrically for dy. Intersecting the CUDA rect with this box removes
    ONLY pixels that fail the in-kernel alpha cutoff (a hard flat region:
    zero output contribution AND zero gradient), so the rendered image and
    every cotangent are bit-identical while the duplicated instance count M
    — which every binning pass, the field gather, and both kernel sweeps
    scale with — drops ~2-3x (opacity-dependent + anisotropy-aware vs the
    isotropic circle). The caller-visible ``radius`` (densify/visibility
    statistics, reference semantics) is untouched.

    Float safety: the half-widths are padded +0.5 px, dwarfing f32 rounding
    of the bound (~1e-4 px), so no pixel with f32-alpha >= ALPHA_MIN can
    fall outside the box.
    """
    A, B, C = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    det = jnp.maximum(A * C - B * B, 1e-24)
    t2 = 2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1.0))
    rx = jnp.sqrt(t2 * C / det) + 0.5
    ry = jnp.sqrt(t2 * A / det) + 0.5
    px, py = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.tile_rect
    # CONTAINING tile bounds (unlike CUDA getRect's `(p+r+T-1)/T` trunc,
    # which drops the boundary tile when p+r lands on its first pixel —
    # fine as a parity contract for the 3-sigma circle, wrong for a box
    # that must cover every alpha-passing pixel), then intersect (clipping
    # to the grid is inherited from the existing rect).
    #
    # The float bounds are clipped to +/-1e9 BEFORE the int cast: a
    # near-degenerate conic whose f32 det cancels to <= 0 hits the 1e-24
    # floor above and yields an astronomically large rx/ry; casting
    # (px + rx) / TILE then saturates to INT_MAX and the `+ 1` WRAPS to
    # INT_MIN, making w = tx1 - tx0 wrap to a huge positive count that
    # corrupts the binner's instance totals (observed on 2/46 frames of
    # the first full 30k run). With the clip, the oversized box simply
    # loses against the grid-clipped CUDA rect in the intersection — the
    # exact right fallback: no snug shrink for that gaussian.
    big = 1e9  # 1e9 / TILE + 1 is far from the int32 wrap point
    tx0 = jnp.maximum(r[:, 0], (jnp.clip(px - rx, -big, big)
                                / TILE).astype(jnp.int32))
    ty0 = jnp.maximum(r[:, 1], (jnp.clip(py - ry, -big, big)
                                / TILE).astype(jnp.int32))
    tx1 = jnp.minimum(r[:, 2], (jnp.clip(px + rx, -big, big)
                                / TILE).astype(jnp.int32) + 1)
    ty1 = jnp.minimum(r[:, 3], (jnp.clip(py + ry, -big, big)
                                / TILE).astype(jnp.int32) + 1)
    w = jnp.maximum(tx1 - tx0, 0)
    h = jnp.maximum(ty1 - ty0, 0)
    tiles = jnp.where(proj.tiles_touched > 0, w * h, 0).astype(jnp.int32)
    rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)
    rect = jnp.where((tiles > 0)[:, None], rect, 0)
    return proj._replace(tile_rect=rect.astype(jnp.int32),
                         tiles_touched=tiles,
                         radius=jnp.where(tiles > 0, proj.radius, 0))


def _prune_and_snug(proj: ProjectedGaussians, opacity: jnp.ndarray
                    ) -> ProjectedGaussians:
    """The binning-side instance reduction applied before every rasterize.

    Exact pre-prune: a gaussian with peak alpha (== opacity, at the
    center) below the 1/255 compositing cutoff can never pass the
    ``alpha >= ALPHA_MIN`` test at ANY pixel, so it contributes zero to
    the output and zero to every gradient (the cutoff is a hard flat
    region). Dropping its instances before binning is therefore
    bit-exact; proj.radius as seen by the CALLER is untouched, so
    radii/visibility statistics keep reference semantics. Then the exact
    rect tightening (see snug_tile_rect). All outputs are integer
    rect/count fields (no tangents): computed on stop_gradient inputs,
    differentiable fields pass through.
    """
    keep = jax.lax.stop_gradient(opacity) >= ALPHA_MIN
    proj_b = proj._replace(
        radius=jnp.where(keep, proj.radius, 0),
        tiles_touched=jnp.where(keep, proj.tiles_touched, 0),
        tile_rect=jnp.where(keep[:, None], proj.tile_rect, 0))
    snug = snug_tile_rect(jax.lax.stop_gradient(proj_b),
                          jax.lax.stop_gradient(opacity))
    return proj_b._replace(tile_rect=snug.tile_rect,
                           tiles_touched=snug.tiles_touched,
                           radius=snug.radius)


def effective_bin_tiles(proj: ProjectedGaussians, opacity: jnp.ndarray,
                        bin_scale: int) -> jnp.ndarray:
    """Per-gaussian covered-bin count EXACTLY as rasterize_pallas will bin
    (opacity pre-prune + snug rects + bin-granularity coarsening). The
    instance-capacity auto-sizer must probe with this — probing raw 16px
    tiles_touched overestimates ~5-10x (no snug, wrong granularity) and
    at full resolution that over-allocation alone can OOM the chip."""
    binned = derive_bin_rect(_prune_and_snug(proj, opacity), bin_scale)
    return binned.tiles_touched


def rasterize_pallas(proj: ProjectedGaussians, rgbz: jnp.ndarray,
                     opacity: jnp.ndarray, cfg: RasterConfig,
                     bins: BinState | None = None):
    """Rasterize projected Gaussians with the Pallas kernels.

    Args:
      proj: projection-stage output.
      rgbz: (N, 4) per-Gaussian [r, g, b, z] channel values (z differentiable
        — gradients w.r.t. depth-as-channel flow here; the sort order does
        not carry gradients, matching the CUDA kernel).
      opacity: (N,) in [0, 1].
      bins: optional precomputed/reused binning layout (see BinState for
        the exactness contract); None bins fresh. Requires masked binning
        (bin_tile > 16) so stale instances are pixel-exactly masked.
    Returns:
      dict: image (6, H, W) channels [r, g, b, z, sil, z^2] WITHOUT
      background, final_T (H, W), overflow () int32 (instances the CURRENT
      snug coverage would drop at this capacity — also a drift signal
      under bin reuse), bins (the BinState used).
    """
    proj_b = _prune_and_snug(proj, opacity)
    if bins is None:
        bins = _bin_state(derive_bin_rect(proj_b, cfg.bin_scale), cfg)
    else:
        assert cfg.bin_tile > TILE, \
            "bin reuse needs the in-kernel 16px rect mask (bin_tile > 16)"
    composite = _make_composite(cfg)
    out_tiles = composite(proj_b.mean2d, proj_b.conic, rgbz, opacity,
                          proj_b.tile_rect, bins)
    gx, gy, bt = cfg.grid_x, cfg.grid_y, cfg.bin_tile
    img = out_tiles.reshape(gy, gx, bt, bt, N_OUT)
    img = img.transpose(4, 0, 2, 1, 3).reshape(N_OUT, gy * bt, gx * bt)
    img = img[:, :cfg.height, :cfg.width]
    total = jnp.sum(derive_bin_rect(proj_b, cfg.bin_scale).tiles_touched)
    overflow = jnp.maximum(0, total - cfg.max_instances)
    return {"image": img[0:6], "final_T": img[6], "overflow": overflow,
            "bins": bins}
