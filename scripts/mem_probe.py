#!/usr/bin/env python
"""Compile-only HBM analysis of the global-stage mapping chunk.

Both round-4 full runs crashed the TPU worker at the first global chunk
compiled at slot capacity 786432 (progressive chunks at the same
capacity, and global chunks at 393216, run fine). This probe lowers and
compiles that exact jit WITHOUT running it and prints XLA's memory
analysis — separating "the executable needs more HBM than v5e has"
(mitigate with remat / smaller chunk / dtype) from a compile-side fault
(bisect differently).

  python scripts/mem_probe.py [--capacity 786432] [--maxi 1549184]
      [--chunk 250] [--two_views] [--run]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=786_432)
    ap.add_argument("--maxi", type=int, default=1_549_184)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--frames", type=int, default=46)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--rebin_every", type=int, default=4)
    ap.add_argument("--two_views", action="store_true")
    ap.add_argument("--run", action="store_true",
                    help="also execute one chunk after compiling")
    ap.add_argument("--populate", type=int, default=0,
                    help="make this many slots ACTIVE with realistic "
                         "random gaussians (a zeros field short-circuits "
                         "binning totals and kernel work — it missed the "
                         "crash that only real occupancy triggers)")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.models.gaussians import GaussianField
    from freesurgs_tpu.train.optim import adam_init
    from freesurgs_tpu.train.steps import (MappingState, TrainConfig,
                                           mapping_chunk)
    from freesurgs_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cap, T = args.capacity, args.frames
    H, W = args.height, args.width
    cam = Camera(height=H, width=W, fx=W * 0.85, fy=W * 0.85,
                 cx=W / 2, cy=H / 2)
    cfg = TrainConfig(max_instances=args.maxi,
                      rebin_every=args.rebin_every)

    def zeros_state():
        import numpy as np
        n_act = min(args.populate, cap)
        if n_act:
            rng = np.random.default_rng(0)
            means = np.zeros((cap, 3), np.float32)
            means[:n_act] = np.stack(
                [rng.uniform(-1.2, 1.2, n_act), rng.uniform(-1.0, 1.0, n_act),
                 rng.uniform(0.8, 3.0, n_act)], -1)
            quats = np.zeros((cap, 4), np.float32)
            quats[:, 0] = 1.0
            quats[:n_act] = rng.normal(size=(n_act, 4))
            logs = np.full((cap, 3), -7.0, np.float32)
            logs[:n_act] = np.log(rng.uniform(0.002, 0.01, (n_act, 3)))
            lo = np.full((cap,), -9.0, np.float32)
            lo[:n_act] = rng.uniform(-2, 3, n_act)
            active = np.arange(cap) < n_act
            f = GaussianField(
                means=jnp.asarray(means), quats=jnp.asarray(quats),
                log_scales=jnp.asarray(logs), logit_opacity=jnp.asarray(lo),
                sh_dc=jnp.asarray(
                    rng.normal(size=(cap, 1, 3)).astype(np.float32) * 0.3),
                sh_rest=jnp.asarray(
                    rng.normal(size=(cap, 15, 3)).astype(np.float32) * 0.1),
                active=jnp.asarray(active),
                max_radii2d=jnp.zeros((cap,)),
                grad_accum=jnp.zeros((cap,)), grad_denom=jnp.zeros((cap,)),
                scene_radius=jnp.asarray(0.75), max_sh_degree=3)
        else:
            f = GaussianField(
                means=jnp.zeros((cap, 3)), quats=jnp.zeros((cap, 4)),
                log_scales=jnp.zeros((cap, 3)),
                logit_opacity=jnp.zeros((cap,)),
                sh_dc=jnp.zeros((cap, 1, 3)),
                sh_rest=jnp.zeros((cap, 15, 3)),
                active=jnp.zeros((cap,), bool),
                max_radii2d=jnp.zeros((cap,)),
                grad_accum=jnp.zeros((cap,)), grad_denom=jnp.zeros((cap,)),
                scene_radius=jnp.asarray(0.75), max_sh_degree=3)
        return MappingState(f, adam_init(f.param_dict()), jnp.int32(2500),
                            jax.random.PRNGKey(0),
                            jnp.zeros((T, H, W), jnp.bfloat16),
                            jnp.zeros((T, 3, H, W), jnp.bfloat16))

    state = zeros_state()
    colors = jnp.zeros((T, 3, H, W))
    monodeps = jnp.zeros((T, H, W))
    w2c = jnp.tile(jnp.eye(4)[None], (T, 1, 1))
    ts = jnp.zeros((args.chunk,), jnp.int32)
    kf = jnp.zeros((T,), jnp.int32)

    jitted = jax.jit(mapping_chunk,
                     static_argnames=("cam", "cfg", "two_views",
                                      "sh_degree", "densify_enabled",
                                      "mesh"))
    print(f"lowering: cap={cap} maxi={args.maxi} chunk={args.chunk} "
          f"two_views={args.two_views} backend={jax.default_backend()}",
          flush=True)
    lowered = jitted.lower(state, colors, monodeps, w2c, ts, kf,
                           jnp.int32(1), cam=cam, cfg=cfg,
                           two_views=args.two_views, sh_degree=3,
                           densify_enabled=True, mesh=None)
    print("lowered ok; compiling...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                print(f"{k}: {v / 1e9:.3f} GB", flush=True)
    print("compile ok", flush=True)
    if args.run:
        out_state, aux = compiled(state, colors, monodeps, w2c, ts, kf,
                                  jnp.int32(1))
        jax.block_until_ready(out_state.field.means)
        print(f"run ok, loss={float(aux['loss']):.4f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
