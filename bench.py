#!/usr/bin/env python
"""Headline benchmark: rendered Mpix/s (forward+backward) at 100k Gaussians.

Prints ONE JSON line:
  {"metric": "render_fwdbwd_mpix_per_s", "value": N, "unit": "Mpix/s",
   "vs_baseline": R}

Setup mirrors BASELINE.json's headline config at the reference's native
SCARED resolution: 100k Gaussians, SH degree 3, 1280x1024 frame, full
forward + backward through the Pallas rasterizer (projection, binning,
compositing, gradients to every Gaussian parameter).

``vs_baseline`` is measured against the reference CUDA pipeline's
equivalent throughput. The reference publishes no numbers (BASELINE.md);
the baseline constant below is the measured-in-literature throughput of
the diff-gaussian-rasterization training step at this scale on an
RTX-3090-class GPU (~15 train iters/s at 0.33 Mpix => ~5 Mpix/s fwd+bwd),
the hardware class the reference targets (README.md:32, CUDA 12.1).
"""

import json
import sys
import time

BASELINE_MPIX_S = 5.0


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from freesurgs_tpu.core.camera import Camera
    from freesurgs_tpu.ops.render import render

    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas" if on_tpu else "pallas_interpret"
    # CPU fallback (no chip): tiny shapes so the line still prints.
    # MAXI: instance capacity. 32px binning produces ~2.5x fewer duplicated
    # instances than the 16px grid, so 384k slots hold this scene with zero
    # overflow (asserted below) — and the binning stage's scatter/gather
    # phases scale with MAXI, so right-sizing it is itself a speedup.
    if on_tpu:
        # MAXI: exact padded requirement with snug rects is 318080
        # (scripts/snug_probe.py); +1 chunk of headroom.
        H, W, N, MAXI, iters, sh_deg, sh_k = 1024, 1280, 100_000,             318_208, 5, 3, 16
    else:
        H, W, N, MAXI, iters, sh_deg, sh_k = 64, 64, 2_000, 8_192, 2, 0, 1

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
        out = render(m, q, s, o, c, jnp.eye(4), cam, impl=impl,
                     sh_degree=sh_deg, max_instances=MAXI)
        return jnp.mean(out["render"] ** 2) + 0.1 * jnp.mean(
            out["render_dep"])

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    overflow = int(render(means, quats, log_scales, logit_op, sh,
                          jnp.eye(4), cam, impl=impl, sh_degree=sh_deg,
                          max_instances=MAXI)["overflow"])
    assert overflow == 0, f"instance capacity too small: {overflow} dropped"

    # All iterations inside ONE jitted fori_loop with a data dependency
    # between steps: this measures pure device throughput (matching the
    # production training loops, which scan on device) and is robust to
    # remote-backend dispatch artifacts that make per-call host timing
    # meaningless.
    @jax.jit
    def many(m):
        def body(_, m):
            g = grad(m, quats, log_scales, logit_op, sh)
            return m + 0.0 * g[0]
        return jax.lax.fori_loop(0, iters, body, m)

    jax.block_until_ready(many(means))
    # best of 3: single-shot wall timings through the remote tunnel can
    # absorb session-management hiccups
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(many(means)))  # force full execution
        dt = min(dt, (time.time() - t0) / iters)
    mpix_s = H * W / 1e6 / dt

    # Second metric, same line: the AMORTIZED training-step throughput.
    # The raw number above rebins every call (CUDA-parity semantics); the
    # production training loops carry the binning layout across optimizer
    # iterations (``rebin_every``, train/steps.py) and pay the ~20 ms
    # binning stage on 1/4 of renders — this is the fwd+bwd rate the
    # training loop actually experiences. Quality parity for the reuse is
    # gated by tests/test_bin_reuse.py and the BASELINE config-3/4 runs.
    REBIN_EVERY = 4
    am_iters = 2 * REBIN_EVERY if on_tpu else 2
    from freesurgs_tpu.ops.raster_pallas import zero_bin_state
    from freesurgs_tpu.ops.render import raster_config

    def loss_amortized(m, q, s, o, c, bins, rebin):
        out = render(m, q, s, o, c, jnp.eye(4), cam, impl=impl,
                     sh_degree=sh_deg, max_instances=MAXI,
                     bins=bins, rebin=rebin)
        return (jnp.mean(out["render"] ** 2)
                + 0.1 * jnp.mean(out["render_dep"])), out["bins"]

    grad_am = jax.grad(loss_amortized, argnums=(0, 1, 2, 3, 4),
                       has_aux=True)

    @jax.jit
    def many_amortized(m):
        bins0 = zero_bin_state(N, raster_config(cam, MAXI, N, impl))

        def body(i, carry):
            m, bins = carry
            g, bins = grad_am(m, quats, log_scales, logit_op, sh, bins,
                              jnp.equal(i % REBIN_EVERY, 0))
            return m + 0.0 * g[0], bins

        return jax.lax.fori_loop(0, am_iters, body, (m, bins0))[0]

    jax.block_until_ready(many_amortized(means))
    dta = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(many_amortized(means)))
        dta = min(dta, (time.time() - t0) / am_iters)
    am_mpix_s = H * W / 1e6 / dta

    print(json.dumps({
        "metric": "render_fwdbwd_mpix_per_s",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
        # the divisor is a literature estimate (~5 Mpix/s fwd+bwd for the
        # CUDA rasterizer on an RTX-3090-class GPU — see module docstring);
        # no CUDA hardware exists here to measure it, so vs_baseline
        # carries that estimate's error bars
        "baseline_source": "literature-estimate RTX3090 ~5 Mpix/s",
        # the training-loop rate (BinState amortization, rebin_every=4)
        "amortized_train_mpix_per_s": round(am_mpix_s, 3),
        "amortized_rebin_every": REBIN_EVERY,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
