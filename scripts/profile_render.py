#!/usr/bin/env python
"""Op-level TPU profile of the headline render config.

Runs forward (and optionally fwd+bwd) at the bench configuration under
jax.profiler.trace, then parses the xplane proto with jax.profiler.ProfileData
and prints per-op time aggregated by HLO op name prefix, attributing the
binning / gather / kernel stages (ROADMAP item: attribute the ~17 ms
unattributed chain before optimizing further).

Usage: python scripts/profile_render.py [--bwd] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(name: str) -> str:
    """Bucket an HLO op name into a pipeline stage."""
    n = name.lower()
    if "fusion" in n or True:
        pass
    for key, tag in [
        ("custom-call", "pallas-kernel"),
        ("sort", "sort"),
        ("gather", "gather"),
        ("scatter", "scatter"),
        ("dynamic-update-slice", "dus"),
        ("dynamic-slice", "ds"),
        ("reduce-window", "cumsum/reduce-window"),
        ("all-reduce", "collective"),
        ("convolution", "conv"),
        ("dot", "dot"),
        ("copy", "copy"),
        ("transpose", "transpose"),
        ("broadcast", "broadcast"),
        ("iota", "iota"),
        ("concatenate", "concat"),
        ("reduce", "reduce"),
        ("select", "select"),
        ("fusion", "fusion"),
    ]:
        if key in n:
            return tag
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.ops.render import render

    H, W, N, MAXI, sh_deg, sh_k = 1024, 1280, 100_000, 1_048_576, 3, 16
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

    def loss(m, q, s, o, c):
        out = render(m, q, s, o, c, jnp.eye(4), cam, impl="pallas",
                     sh_degree=sh_deg, max_instances=MAXI)
        return jnp.mean(out["render"] ** 2) + 0.1 * jnp.mean(out["render_dep"])

    if args.bwd:
        fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    else:
        fn = loss

    @jax.jit
    def many(m):
        def body(_, m):
            if args.bwd:
                g = fn(m, quats, log_scales, logit_op, sh)
                return m + 0.0 * g[0]
            return m + 0.0 * fn(m, quats, log_scales, logit_op, sh) * jnp.ones(3)
        return jax.lax.fori_loop(0, args.iters, body, m)

    jax.block_until_ready(many(means))  # compile

    tmpdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmpdir):
        jax.block_until_ready(many(means))

    files = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane file found under", tmpdir)
        return 1
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read())

    # Find the TPU device plane and aggregate XEvents by name.
    per_op = collections.Counter()
    total_ns = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry the per-op events; step lines don't.
            if "xla op" not in lname and "ops" not in lname:
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                total_ns += ev.duration_ns
    if not per_op:
        # fallback: dump plane/line structure for debugging
        for plane in pd.planes:
            print("PLANE", plane.name)
            for line in plane.lines:
                n_ev = len(list(line.events))
                print("   line", line.name, n_ev)
        return 1

    iters = args.iters
    print(f"total device op time: {total_ns/1e6/iters:.2f} ms/iter "
          f"({'fwd+bwd' if args.bwd else 'fwd'})")
    by_stage = collections.Counter()
    for name, ns in per_op.items():
        by_stage[classify(name)] += ns
    print("\n-- by op class --")
    for tag, ns in by_stage.most_common():
        print(f"{ns/1e6/iters:9.3f} ms  {tag}")
    print(f"\n-- top {args.top} ops --")
    for name, ns in per_op.most_common(args.top):
        print(f"{ns/1e6/iters:9.3f} ms  {name[:140]}")
    print("\ntrace dir:", tmpdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
