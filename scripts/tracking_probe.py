#!/usr/bin/env python
"""Isolated pose-recovery probe (ROADMAP round-4 #10a-b).

Question: on a frozen PERFECT map with EXACT flow and exact previous-frame
depth/pose, how close can one frame's tracking get to the ground-truth
pose — as a function of optimizer (reference 50-iter Adam vs Gauss-Newton
flow-PnP, train/flow_pnp.py), iteration budget, and input noise? This
isolates the tracking OPTIMIZATION from map quality, which the round-4
full-run attribution identified as the quality ceiling (BASELINE.md:
RPE-trans = 79% of GT per-frame motion with a healthy map).

Measured (CPU oracle, 64x80, 400 gaussians, init error = frame-to-frame
motion 0.034 trans / 1.58 deg):

    flow loss at GT pose: exactly 0 (no systematic bias in the loss)
    adam iters=50  (reference budget): trans error 42.9% of init, 0.51 deg
    adam iters=100: 1.4%   adam iters=200: 0.4%  (Adam converges, slowly)
    GN   iters=2:   0.033%  rot 0.000 deg  (quadratic convergence)
    GN8 + adam 50:  1.2%  (photometric phase wanders slightly, recovers)
    GN8, 0.5px flow noise:             11.2%
    GN8, 2% depth noise:                2.0%
    GN8, both noises:                  11.5%
    GN8, bf16 depth cache:              0.04%

Conclusion: the reference's 50-iter Adam budget is the tracking limiter;
GN flow-PnP initialization (TrainConfig.tracking_gn_iters, default 8)
removes it. CPU-only (does not touch the TPU tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.transforms import quat_normalize, quat_to_rotmat
from freesurgs_tpu.data.synthetic import make_scene
from freesurgs_tpu.models.gaussians import GaussianField
from freesurgs_tpu.train import losses
from freesurgs_tpu.train.flow_pnp import flow_pnp_refine
from freesurgs_tpu.train.steps import TrainConfig, tracking_loop


def field_from_scene(scene, cap=1024):
    n = scene.means.shape[0]

    def pad(x):
        return jnp.zeros((cap,) + x.shape[1:], x.dtype).at[:n].set(x)

    quats = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
    quats = quats.at[:n].set(scene.quats)
    return GaussianField(
        means=pad(scene.means), quats=quats,
        log_scales=pad(scene.log_scales),
        logit_opacity=pad(scene.logit_opacity),
        sh_dc=pad(scene.sh[:, :1]),
        sh_rest=jnp.zeros((cap, 0, 3), jnp.float32),
        active=jnp.zeros((cap,), bool).at[:n].set(True),
        max_radii2d=jnp.zeros((cap,)), grad_accum=jnp.zeros((cap,)),
        grad_denom=jnp.zeros((cap,)),
        scene_radius=jnp.asarray(1.5), max_sh_degree=0)


def pose_err(q, t, q_gt, t_gt):
    q = np.asarray(quat_normalize(jnp.asarray(q)))
    q_gt = np.asarray(quat_normalize(jnp.asarray(q_gt)))
    dt = float(np.linalg.norm(np.asarray(t) - np.asarray(t_gt)))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    Rg = np.asarray(quat_to_rotmat(jnp.asarray(q_gt)))
    cos = (np.trace(R.T @ Rg) - 1.0) / 2.0
    dr = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
    return dt, dr


def main():
    H, W = 64, 80
    scene = make_scene(num_frames=4, n_gaussians=400, height=H, width=W,
                       seed=3)
    field = field_from_scene(scene)
    t = 2
    q_gt, t_gt = scene.gt_quats[t], scene.gt_trans[t]
    rigid = jnp.ones((H, W))

    # init = previous frame's pose (the t=1 copy-previous init; error =
    # one frame of GT motion, the same scale as the full-res sequence).
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    dt0, dr0 = pose_err(q0, t0, q_gt, t_gt)
    print(f"init error: trans {dt0:.5f}, rot {dr0:.3f} deg")

    # ---- systematics: flow loss at the GT pose (exact flow/depth)
    flow_at_gt = losses.flow_projection_loss(
        scene.depths[t - 1], scene.gt_w2c[t - 1], scene.gt_w2c[t],
        scene.flows_fw[t - 1], scene.cam, rigid_mask=rigid)
    print(f"flow loss at GT pose: {float(flow_at_gt):.3e} px")

    # ---- reference Adam tracking (tracking_gn_iters=0): sweep iters
    for iters in (50, 100, 200):
        cfg = TrainConfig(tracking_iters=iters, max_instances=8192,
                          impl="oracle", tracking_gn_iters=0)
        tic = time.time()
        q1, t1, m = tracking_loop(
            field, q0, t0, scene.colors[t], scene.depths[t - 1],
            scene.gt_w2c[t - 1], scene.flows_fw[t - 1], rigid, scene.cam,
            cfg, sh_degree=0)
        dt1, dr1 = pose_err(q1, t1, q_gt, t_gt)
        print(f"adam iters={iters:4d}: trans {dt1:.5f} ({dt1/dt0:5.1%}) "
              f"rot {dr1:.3f} deg  loss {float(m['loss']):.4f} "
              f"[{time.time()-tic:.1f}s]")

    # ---- GN flow-PnP alone, sweep iters
    for iters in (2, 5, 10):
        qg, tg, diag = flow_pnp_refine(
            q0, t0, scene.depths[t - 1], scene.gt_w2c[t - 1],
            scene.flows_fw[t - 1], scene.cam, rigid_mask=rigid,
            iters=iters)
        dtg, drg = pose_err(qg, tg, q_gt, t_gt)
        print(f"GN   iters={iters:4d}: trans {dtg:.6f} ({dtg/dt0:7.3%}) "
              f"rot {drg:.4f} deg  mean_resid {float(diag[0]):.4f} px "
              f"n_eff {float(diag[1]):.0f}")

    # ---- the production default: GN init + reference Adam refinement
    cfg = TrainConfig(tracking_iters=50, max_instances=8192, impl="oracle")
    q1, t1, m = tracking_loop(
        field, q0, t0, scene.colors[t], scene.depths[t - 1],
        scene.gt_w2c[t - 1], scene.flows_fw[t - 1], rigid, scene.cam,
        cfg, sh_degree=0)
    dt1, dr1 = pose_err(q1, t1, q_gt, t_gt)
    print(f"GN{cfg.tracking_gn_iters} + adam 50: trans {dt1:.6f} "
          f"({dt1/dt0:7.3%}) rot {dr1:.4f} deg")

    # ---- robustness: noisy flow / depth (≈ HS-flow and blurred-map
    # rendered-depth error scales), and the bf16 production depth cache
    rng = np.random.default_rng(0)
    noisy_flow = scene.flows_fw[t - 1] + jnp.asarray(
        rng.normal(size=(2, H, W)).astype(np.float32)) * 0.5
    noisy_depth = scene.depths[t - 1] * jnp.asarray(
        1.0 + rng.normal(size=(H, W)).astype(np.float32) * 0.02)
    for name, dep, flo in (
            ("noisy-flow(0.5px)", scene.depths[t - 1], noisy_flow),
            ("noisy-depth(2%)", noisy_depth, scene.flows_fw[t - 1]),
            ("both-noises", noisy_depth, noisy_flow),
            ("bf16-depth", scene.depths[t - 1].astype(jnp.bfloat16),
             scene.flows_fw[t - 1])):
        qg, tg, diag = flow_pnp_refine(
            q0, t0, dep, scene.gt_w2c[t - 1], flo, scene.cam,
            rigid_mask=rigid, iters=8)
        dtg, drg = pose_err(qg, tg, q_gt, t_gt)
        print(f"GN8 {name:18s}: trans {dtg:.6f} ({dtg/dt0:7.3%}) "
              f"rot {drg:.4f} deg")


if __name__ == "__main__":
    main()
