#!/usr/bin/env python
"""Minimal repro of the shard_map check_vma transpose miscompile (jax 0.9).

Context: ``parallel/sharded.py`` runs its band renderer with
``check_vma=False`` because with the varying-axes tracker ENABLED the
transpose (gradient) of a shard_map body that

  1. takes a REPLICATED input (``in_specs=P()``),
  2. builds an ``axis_index``-dependent mask, and
  3. applies a data-dependent permutation gather (``w[argsort(...)]``)
     before the masked reduction,

produces WRONG parameter cotangents, while ``check_vma=False`` matches the
single-device gradient exactly. The mask alone (no gather) and a plain
``dynamic_slice`` transpose are both correct under either setting — the
permutation gather over the replicated operand is the trigger (exactly the
depth-argsort + gather structure of the tile binner).

This is the filing-ready standalone repro (no dependency on this repo's
code). Zero-egress environments can't open an upstream issue; this script
plus ``tests/test_vma_regression.py`` (the VERIFIED_JAX pin + gradient-
parity gate) is the auditable trail. If a jax upgrade makes CASE "sort+
gather / check_vma=True" print 0.0, the workaround can be dropped.

Observed on jax 0.9.0 (cpu, 4 virtual devices):
    sort+gather  check_vma=True : max|grad err| = 8.0   <-- WRONG
    sort+gather  check_vma=False: max|grad err| = 0.0
    mask-only    either         : 0.0
    dynamic_slice either        : 0.0
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

N = 32
SHARD = N // 4


def main():
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))

    def band_sort_gather(w):
        # Each shard masks its own disjoint slice of a replicated input,
        # permutes by a data-dependent argsort, and reduces: the masked
        # sections partition [0, N), so sum over shards == sum(w * w) and
        # d/dw == 2w everywhere.
        i = jax.lax.axis_index("x")
        idx = jnp.arange(N)
        m = ((idx >= i * SHARD) & (idx < (i + 1) * SHARD)).astype(w.dtype)
        order = jnp.argsort(jnp.where(m > 0, w, jnp.inf))
        g = w[order] * m[order]
        return jnp.sum(g * g)[None]

    def band_mask_only(w):
        i = jax.lax.axis_index("x")
        idx = jnp.arange(N)
        m = ((idx >= i * SHARD) & (idx < (i + 1) * SHARD)).astype(w.dtype)
        return jnp.sum(w * m * w * m)[None]

    def band_dynslice(w):
        i = jax.lax.axis_index("x")
        g = jax.lax.dynamic_slice(w, (i * SHARD,), (SHARD,))
        return jnp.sum(g * g)[None]

    def gradient(body, vma, w):
        def loss(w):
            f = jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                              out_specs=P("x"), check_vma=vma)
            return jnp.sum(f(w))
        return jax.grad(loss)(w)

    w = jnp.asarray(np.random.default_rng(0).normal(size=N)
                    .astype(np.float32))
    g_ref = 2.0 * w
    print(f"jax {jax.__version__}")
    bad = False
    for name, body in [("sort+gather", band_sort_gather),
                       ("mask-only", band_mask_only),
                       ("dynamic_slice", band_dynslice)]:
        for vma in (True, False):
            err = float(jnp.max(jnp.abs(gradient(body, vma, w) - g_ref)))
            tag = ""
            if err > 1e-5:
                tag = "   <-- WRONG COTANGENTS"
                bad = True
            print(f"{name:14s} check_vma={str(vma):5s} "
                  f"max|grad err| = {err:.6g}{tag}")
    if bad:
        print("\nminiature of parallel/sharded.py's band renderer: the "
              "check_vma=False workaround is still required on this jax")
    else:
        print("\nno miscompile on this jax version: the check_vma=False "
              "workaround in parallel/sharded.py can be re-evaluated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
