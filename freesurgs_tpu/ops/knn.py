"""Mean squared distance to the 3 nearest neighbors (scale initialization).

TPU-native replacement for the reference's ``simple_knn._C.distCUDA2``
(native component N2, SURVEY.md section 2.1; call sites
``scene/gaussian_model.py:217, 346``): per point, the mean of squared
distances to its 3 nearest neighbors, used as ``log(sqrt(dist2))`` scale
init.

The CUDA version builds a Morton-order spatial structure to prune an
approximate search. On TPU the idiomatic choice is exact chunked brute
force: pairwise squared distances are one big matmul
(|x|^2 + |y|^2 - 2 x.y) which lives on the MXU, with a running top-4 merge
across column chunks to bound memory. 100k x 100k x 3 is ~60 GFLOP —
sub-millisecond territory for the MXU, and exact where the CUDA kernel is
approximate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_sq_dist_3nn(pts: jnp.ndarray, valid: jnp.ndarray | None = None,
                     chunk: int = 2048) -> jnp.ndarray:
    """(N, 3) points -> (N,) mean squared distance to the 3 nearest others.

    ``valid`` masks out padding slots (they neither query nor serve as
    neighbors; their output is 0).
    """
    n = pts.shape[0]
    npad = _round_up(max(n, 4), chunk)
    big = jnp.float32(1e30)

    p = jnp.zeros((npad, 3), jnp.float32).at[:n].set(pts.astype(jnp.float32))
    v = jnp.zeros((npad,), bool).at[:n].set(
        jnp.ones((n,), bool) if valid is None else valid)

    sq = jnp.sum(p * p, axis=1)

    def col_block(carry, j):
        best = carry  # (npad, 4) smallest squared distances so far
        cols = jax.lax.dynamic_slice(p, (j * chunk, 0), (chunk, 3))
        cols_sq = jax.lax.dynamic_slice(sq, (j * chunk,), (chunk,))
        cols_v = jax.lax.dynamic_slice(v, (j * chunk,), (chunk,))
        d = (sq[:, None] + cols_sq[None, :]
             - 2.0 * jnp.dot(p, cols.T,
                             precision=jax.lax.Precision.HIGHEST))
        d = jnp.maximum(d, 0.0)
        # exclude self-pairs and invalid columns
        row_ids = jnp.arange(npad)[:, None]
        col_ids = j * chunk + jnp.arange(chunk)[None, :]
        d = jnp.where((row_ids == col_ids) | ~cols_v[None, :], big, d)
        # merge: top-4 of (previous best | this block)
        merged = jnp.concatenate([best, d], axis=1)
        best = -jax.lax.top_k(-merged, 4)[0]
        return best, None

    best0 = jnp.full((npad, 4), big)
    nblocks = npad // chunk
    best, _ = jax.lax.scan(col_block, best0, jnp.arange(nblocks))
    mean3 = jnp.mean(best[:, :3], axis=1)
    mean3 = jnp.where(v, mean3, 0.0)
    return mean3[:n]


def initial_log_scales(pts: jnp.ndarray, valid: jnp.ndarray | None = None,
                       eps: float = 1e-7) -> jnp.ndarray:
    """Reference scale init: log(sqrt(clamp(dist2, 1e-7))) tiled to 3 axes
    (``scene/gaussian_model.py:346-347``)."""
    d2 = jnp.maximum(mean_sq_dist_3nn(pts, valid), eps)
    s = 0.5 * jnp.log(d2)  # log(sqrt(x)) == 0.5 log x
    return jnp.tile(s[:, None], (1, 3))
