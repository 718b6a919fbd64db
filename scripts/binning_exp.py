#!/usr/bin/env python
"""Experiments on the two binning hot spots found by binning_micro.py:

A. raw_count: scatter-add over tile_id (current) vs SAT-derived totals.
B. feat build: 10 column scatter-sets (current) vs one M-row gather by
   gather_idx (+ transpose), vs gather without transpose.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    N = 100_000
    M = 393_216
    T = 1280
    iters = 10
    rng = np.random.default_rng(0)

    tile_id = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
    valid = jnp.asarray((rng.uniform(size=M) < 0.95))
    pos = jnp.asarray(rng.permutation(M).astype(np.int32))
    gidx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    fields = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(M, 10)).astype(np.float32))

    def run(name, fn, *inputs):
        @jax.jit
        def many(s):
            def body(_, s):
                eps = 0.0 * jnp.log(jnp.abs(s) + 0.5)
                ie = eps.astype(jnp.int32)
                r = fn(*[x + (ie if x.dtype == jnp.int32 else
                              (eps if x.dtype == jnp.float32 else 0))
                         for x in inputs])
                return s + r
            return jax.lax.fori_loop(0, iters, body, s)
        s0 = jnp.float32(1.0)
        jax.block_until_ready(many(s0))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(many(s0))
            best = min(best, (time.time() - t0) / iters)
        print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)

    # A: the scatter-add counting
    def count_scatter(tid):
        rc = jnp.zeros((T + 1,), jnp.int32).at[tid].add(1, mode="drop")[:T]
        return jnp.sum(rc).astype(jnp.float32)
    run("A1 raw_count scatter-add (M->1281)", count_scatter, tile_id)

    # A2: scatter-add of ones at unique positions (for contrast)
    def count_scatter_uniq(p):
        rc = jnp.zeros((M + 1,), jnp.int32).at[p].add(1, mode="drop")[:M]
        return jnp.sum(rc).astype(jnp.float32)
    run("A2 scatter-add unique idx (M->M)", count_scatter_uniq, pos)

    # B1: 10 column scatter-sets
    def feat_scatters(p):
        rows = [jnp.zeros((M + 1,), jnp.float32)
                .at[p].set(vals[:, k], mode="drop")[:M] for k in range(10)]
        return jnp.sum(jnp.stack(rows))
    run("B1 feat: 10 col scatter-sets", feat_scatters, pos)

    # B2: one M-row gather (random rows) + transpose to (16, M)
    def feat_gather_t(gi):
        f = fields[gi]                    # (M, 16)
        return jnp.sum(f.T)
    run("B2 feat: (M,16) row gather + T", feat_gather_t, gidx)

    # B3: gather without transpose
    def feat_gather(gi):
        return jnp.sum(fields[gi])
    run("B3 feat: (M,16) row gather", feat_gather, gidx)

    # B4: transpose alone
    big = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
    def transpose_only(x):
        return jnp.sum(x.T * 1.0000001)
    run("B4 (M,16) -> (16,M) transpose", transpose_only, big)

    # B5: gather of WIDE (M,50) rows for contrast with megarecord stage
    rec = jnp.asarray(rng.integers(0, 100, (N + 1, 50)).astype(np.int32))
    def wide_gather(gi):
        return jnp.sum(rec[gi]).astype(jnp.float32)
    run("B5 (M,50) int row gather random", wide_gather, gidx)

    # B6: same gather but SORTED indices
    gsort = jnp.sort(gidx)
    def wide_gather_sorted(gi):
        return jnp.sum(rec[gi]).astype(jnp.float32)
    run("B6 (M,50) int row gather sorted", wide_gather_sorted, gsort)


if __name__ == "__main__":
    sys.exit(main())
