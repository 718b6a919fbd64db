#!/usr/bin/env python
"""Production train-step throughput: the FULL jitted mapping step.

bench.py's headline is a bare render+grad loop; this measures the actual
production mapping iteration (render -> rgb + pearson + local-pearson
losses -> autodiff to every Gaussian parameter -> per-group Adam ->
densification statistics) as `train/steps.py:mapping_chunk` executes it
— a lax.scan over iterations inside ONE jitted call, so the number is
pure device throughput (CLAUDE.md timing rules).

Usage: python scripts/bench_train_step.py [--n 100000] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 1280])
    ap.add_argument("--maxi", type=int, default=393_216)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--two-views", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.models.gaussians import GaussianField
    from freesurgs_tpu.train.optim import adam_init
    from freesurgs_tpu.train.steps import (MappingState, TrainConfig,
                                           make_jitted_mapping)

    H, W = args.hw
    N = args.n
    sh_k = (args.sh_degree + 1) ** 2
    rng = np.random.default_rng(0)
    cam = Camera(height=H, width=W, fx=W * 0.78, fy=W * 0.78, cx=W / 2,
                 cy=H / 2)
    means = jnp.asarray(np.stack(
        [rng.uniform(-1.2, 1.2, N), rng.uniform(-1.0, 1.0, N),
         rng.uniform(0.8, 4.0, N)], -1).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    field = GaussianField(
        means=means, quats=quats,
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.012, (N, 3))).astype(np.float32)),
        logit_opacity=jnp.asarray(
            rng.uniform(-2, 2, N).astype(np.float32)),
        sh_dc=jnp.asarray(
            rng.normal(size=(N, 1, 3)).astype(np.float32) * 0.3),
        sh_rest=jnp.asarray(
            rng.normal(size=(N, sh_k - 1, 3)).astype(np.float32) * 0.1),
        active=jnp.ones((N,), bool),
        max_radii2d=jnp.zeros((N,)), grad_accum=jnp.zeros((N,)),
        grad_denom=jnp.zeros((N,)), scene_radius=jnp.asarray(2.0),
        max_sh_degree=args.sh_degree)

    T = 2
    colors = jnp.asarray(rng.uniform(size=(T, 3, H, W)).astype(np.float32))
    monodeps = jnp.asarray(
        rng.uniform(0.5, 1.5, (T, H, W)).astype(np.float32))
    w2c_all = jnp.broadcast_to(jnp.eye(4), (T, 4, 4))

    cfg = TrainConfig(max_instances=args.maxi, impl="pallas",
                      densify_interval=10**9)  # static-shape steady state
    mapping = make_jitted_mapping(cam, cfg)
    st = MappingState(field, adam_init(field.param_dict()), jnp.int32(0),
                      jax.random.PRNGKey(0), jnp.zeros((T, H, W)),
                      jnp.zeros((T, 3, H, W)))
    ts = jnp.zeros((args.iters,), jnp.int32)
    kf = jnp.zeros((T,), jnp.int32)

    def run(st):
        st2, aux = mapping(st, colors, monodeps, w2c_all, ts, kf,
                           jnp.int32(1), cam=cam, cfg=cfg,
                           two_views=args.two_views,
                           sh_degree=args.sh_degree, densify_enabled=False)
        return st2, aux

    # Force completion with a host scalar read: on tunneled backends
    # block_until_ready returns at ENQUEUE, not completion (CLAUDE.md
    # timing rules), which silently times dispatch instead of execution.
    st2, aux = run(st)
    float(jnp.sum(st2.field.means))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st2, aux = run(st)
        float(jnp.sum(st2.field.means))
        best = min(best, (time.time() - t0) / args.iters)
    mpix_s = H * W / 1e6 / best
    print(json.dumps({
        "metric": "mapping_step_mpix_per_s",
        "value": round(mpix_s, 3), "unit": "Mpix/s",
        "ms_per_step": round(best * 1e3, 2),
        "two_views": args.two_views,
    }))


if __name__ == "__main__":
    main()
