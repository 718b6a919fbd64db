#!/usr/bin/env python
"""Isolated-op timing of the CURRENT fast-binner phases at bench sizes.

Each op is timed as a chained jitted fori_loop (CLAUDE.md: host timing of
single calls through the TPU tunnel is meaningless). The feedback scalar
is folded through a not-provably-constant f32 so XLA can't hoist.

Usage: python scripts/binning_phase_timing.py [--n 100000] [--maxi 318208]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--maxi", type=int, default=318_208)
    ap.add_argument("--tiles", type=int, default=1280)  # 40x32 at 32px
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from freesurgs_tpu.ops.binning_fast import S1, S2

    n, m, T = args.n, args.maxi, args.tiles
    it = args.iters
    rng = np.random.default_rng(0)

    depth = jnp.asarray(rng.uniform(0.5, 4.0, n).astype(np.float32))
    fkeys = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    idx_n = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    idx_m = jnp.asarray(rng.integers(0, m, m).astype(np.int32))
    vals_m = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    rec = jnp.asarray(rng.normal(size=(n + 1, 8 + S2)).astype(np.float32))
    n_b2 = -(-n // S2)
    comb = jnp.asarray(rng.integers(0, m, (n_b2 * T,)).astype(np.int32))
    idx_comb = jnp.asarray(rng.integers(0, n_b2 * T, m).astype(np.int32))
    bins3 = jnp.zeros((n_b2, 33, 41), jnp.int32)
    r4 = jnp.asarray(rng.integers(0, 32, (n, 4)).astype(np.int32))
    mrow = jnp.asarray(rng.normal(size=(m, 10)).astype(np.float32))

    def loop(body):
        @jax.jit
        def f(x):
            def step(_, x):
                s = body(x)
                return x * (1.0 + 0.0 * jnp.log(jnp.abs(s) + 0.5))
            return jax.lax.fori_loop(0, it, step, x)
        return f

    def timed(name, body, x):
        f = loop(body)
        jax.block_until_ready(f(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(x))
            best = min(best, (time.time() - t0) / it)
        print(f"{name:34s} {best * 1e3:7.2f} ms")
        return best

    timed("argsort N (f32, stable)",
          lambda x: jnp.argsort(x, stable=True)[-1].astype(jnp.float32) + x[0],
          depth)
    timed("counting-rank N (hist+gather+cmp)",
          lambda x: _count_rank(x, n)[-1].astype(jnp.float32) + x[0], depth)
    timed("order-apply gather (N,4) rows",
          lambda x: jnp.sum(r4[jnp.clip(x, 0, n - 1).astype(jnp.int32)[:n]]
                            ).astype(jnp.float32) + x[0],
          depth * 0 + jnp.arange(n, dtype=jnp.float32))
    timed("SAT tables (scatter+2D cumsum)",
          lambda x: jnp.sum(jnp.cumsum(jnp.cumsum(
              bins3.at[idx_n[:n] % n_b2, r4[:, 0] % 33, r4[:, 1] % 41]
              .add(jnp.clip(x[:n], 0, 1).astype(jnp.int32)),
              axis=1), axis=2)).astype(jnp.float32) + x[0],
          depth)
    timed("slot map (scatter-max m + cummax)",
          lambda x: jax.lax.cummax(
              jnp.full((m + 1,), -1, jnp.int32)
              .at[jnp.clip(x.astype(jnp.int32), 0, m)].max(idx_m)[:m]
          )[-1].astype(jnp.float32) + x[0],
          fkeys * m)
    timed("megarecord gather (m, 40) rows",
          lambda x: jnp.sum(rec[jnp.clip(x.astype(jnp.int32), 0, n)[:m]]
                            ).astype(jnp.float32) + x[0],
          fkeys * n)
    timed("COMB element gather (m,)",
          lambda x: jnp.sum(comb[jnp.clip(x.astype(jnp.int32), 0,
                                          n_b2 * T - 1)[:m]]
                            ).astype(jnp.float32) + x[0],
          fkeys * (n_b2 * T))
    timed("gather_idx scatter-set (m,)",
          lambda x: jnp.full((m + 1,), n, jnp.int32)
          .at[jnp.clip(x.astype(jnp.int32), 0, m)].set(vals_m)[:m][-1]
          .astype(jnp.float32) + x[0],
          fkeys * m)
    timed("bwd pre-gather (m, 10) rows",
          lambda x: jnp.sum(mrow[jnp.clip(x.astype(jnp.int32), 0,
                                          m - 1)[:m]]
                            ).astype(jnp.float32) + x[0],
          fkeys * m)
    timed("bwd cumsum (m, 10)",
          lambda x: jnp.cumsum(mrow * x[0], axis=0)[-1, 0] + x[0],
          fkeys)


def _count_rank(depth, n):
    """Quantized counting rank: bucket histogram + block prefix + in-block
    stable tie-break. Order-equivalent to argsort up to ties within
    1/2^14 of the depth range."""
    import jax.numpy as jnp
    B = 1 << 14
    S = 256
    nb = -(-n // S)
    dmin = jnp.min(depth)
    scale = (B - 1) / jnp.maximum(jnp.max(depth) - dmin, 1e-12)
    b = jnp.clip(((depth - dmin) * scale).astype(jnp.int32), 0, B - 1)
    blk = jnp.arange(n, dtype=jnp.int32) // S
    flat = blk * B + b
    h2 = jnp.zeros((nb * B,), jnp.int32).at[flat].add(1).reshape(nb, B)
    tot = jnp.sum(h2, axis=0)
    gstart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(tot)[:-1]])
    bpre = jnp.cumsum(h2, axis=0) - h2          # exclusive over blocks
    table = (gstart[None, :] + bpre).reshape(-1)
    base = table[flat]
    bb = jnp.pad(b, (0, nb * S - n), constant_values=-1).reshape(nb, S)
    same = (bb[:, None, :] == bb[:, :, None])
    tri = jnp.tril(jnp.ones((S, S), jnp.bool_), k=-1)
    rank_in = jnp.sum(same & tri[None], axis=2).reshape(-1)[:n]
    return base + rank_in


if __name__ == "__main__":
    main()
