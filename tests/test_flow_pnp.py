"""Gauss-Newton flow-PnP tracking initialization (train/flow_pnp.py).

The round-4 full-run attribution (BASELINE.md) measured the reference's
50-iteration Adam tracking stalling at ~79% relative per-frame translation
error; the isolation probe (scripts/tracking_probe.py) reproduced the stall
(43% of the init error on a perfect map with exact flow) and showed GN
flow-PnP converging to 0.03% in 2 iterations. These tests pin that
behavior: near-exact recovery on exact inputs, graceful degradation under
noise, the degenerate-input guard, and the integrated tracking_loop path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.data.synthetic import make_scene
from freesurgs_tpu.train.flow_pnp import flow_pnp_refine, so3_exp
from freesurgs_tpu.train.steps import TrainConfig, tracking_loop

from test_training_steps import field_from_scene, pose_errors


def _scene():
    return make_scene(num_frames=4, n_gaussians=400, height=64, width=80,
                      seed=3)


def _gt_rot_err_deg(q, q_gt):
    from freesurgs_tpu.core.transforms import quat_normalize, quat_to_rotmat
    R = np.asarray(quat_to_rotmat(quat_normalize(jnp.asarray(q))))
    Rg = np.asarray(quat_to_rotmat(quat_normalize(jnp.asarray(q_gt))))
    cos = (np.trace(R.T @ Rg) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def test_so3_exp_small_angle_and_finite_at_zero():
    assert np.allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3))
    w = jnp.asarray([0.3, -0.2, 0.1])
    R = np.asarray(so3_exp(w))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)
    # gradient finite at zero (the converged fixed point of the GN loop)
    g = jax.grad(lambda v: jnp.sum(so3_exp(v)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_gn_recovers_pose_near_exactly():
    scene = _scene()
    t = 2
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    dq0, dt0 = pose_errors(q0, t0, scene.gt_quats[t], scene.gt_trans[t])
    q, tr, diag = flow_pnp_refine(
        q0, t0, scene.depths[t - 1], scene.gt_w2c[t - 1],
        scene.flows_fw[t - 1], scene.cam,
        rigid_mask=jnp.ones((64, 80)), iters=5)
    _, dt1 = pose_errors(q, tr, scene.gt_quats[t], scene.gt_trans[t])
    assert dt1 < 0.005 * dt0, (dt0, dt1)          # probe measured 0.03%
    assert _gt_rot_err_deg(q, scene.gt_quats[t]) < 0.01
    assert float(diag[0]) < 0.01                  # mean residual, px
    assert float(diag[1]) > 100                   # effective points


def test_gn_noisy_inputs_still_beat_adam_budget():
    """0.5px flow + 2% depth noise: the probe measured ~11.5% of the init
    error — far under the reference Adam budget's 43% on CLEAN inputs."""
    scene = _scene()
    t = 2
    rng = np.random.default_rng(0)
    noisy_flow = scene.flows_fw[t - 1] + jnp.asarray(
        rng.normal(size=scene.flows_fw[t - 1].shape).astype(np.float32)
    ) * 0.5
    noisy_depth = scene.depths[t - 1] * jnp.asarray(
        1.0 + rng.normal(size=(64, 80)).astype(np.float32) * 0.02)
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    _, dt0 = pose_errors(q0, t0, scene.gt_quats[t], scene.gt_trans[t])
    q, tr, _ = flow_pnp_refine(
        q0, t0, noisy_depth, scene.gt_w2c[t - 1], noisy_flow, scene.cam,
        rigid_mask=jnp.ones((64, 80)), iters=8)
    _, dt1 = pose_errors(q, tr, scene.gt_quats[t], scene.gt_trans[t])
    assert dt1 < 0.25 * dt0, (dt0, dt1)


def test_gn_degenerate_depth_returns_init():
    """Tracking a frame after an unmapped (test) frame: the depth cache is
    all zeros -> zero effective weight -> the init must pass through
    unchanged (not a garbage solve)."""
    scene = _scene()
    t = 2
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    q, tr, diag = flow_pnp_refine(
        q0, t0, jnp.zeros((64, 80)), scene.gt_w2c[t - 1],
        scene.flows_fw[t - 1], scene.cam, iters=5)
    assert float(diag[1]) == 0.0
    np.testing.assert_allclose(np.asarray(tr), np.asarray(t0), atol=1e-6)
    from freesurgs_tpu.core.transforms import quat_normalize
    np.testing.assert_allclose(
        np.abs(np.asarray(quat_normalize(q))),
        np.abs(np.asarray(quat_normalize(q0))), atol=1e-6)


def test_tracking_loop_with_gn_default_is_tight():
    """The integrated default path (GN init + reference Adam refinement)
    must land an order of magnitude closer than the Adam-only budget
    (test_tracking_recovers_pose asserts < 0.55x; this asserts < 0.05x)."""
    scene = _scene()
    field = field_from_scene(scene)
    t = 2
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    _, dt0 = pose_errors(q0, t0, scene.gt_quats[t], scene.gt_trans[t])
    cfg = TrainConfig(tracking_iters=50, max_instances=8192,
                      impl="pallas_interpret")
    assert cfg.tracking_gn_iters > 0   # GN is the production default
    q1, t1, m = tracking_loop(
        field, q0, t0, scene.colors[t], scene.depths[t - 1],
        scene.gt_w2c[t - 1], scene.flows_fw[t - 1],
        jnp.ones((64, 80)), scene.cam, cfg, sh_degree=0)
    _, dt1 = pose_errors(q1, t1, scene.gt_quats[t], scene.gt_trans[t])
    assert np.isfinite(float(m["loss"]))
    assert dt1 < 0.05 * dt0, (dt0, dt1)
    assert _gt_rot_err_deg(q1, scene.gt_quats[t]) < 0.1
