import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import build_w2c
from freesurgs_tpu.ops.knn import initial_log_scales, mean_sq_dist_3nn
from freesurgs_tpu.ops.ssim import ssim
from freesurgs_tpu.train import losses, optim


# ------------------------------------------------------------------- KNN

def test_knn_vs_scipy(rng):
    from scipy.spatial import cKDTree
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    ours = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), chunk=128))
    d, _ = cKDTree(pts).query(pts, k=4)  # first neighbor is self
    ref = (d[:, 1:] ** 2).mean(axis=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_knn_valid_mask(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[40:] = False
    ours = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), jnp.asarray(valid),
                                       chunk=128))
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts[:40]).query(pts[:40], k=4)
    ref = (d[:, 1:] ** 2).mean(axis=1)
    np.testing.assert_allclose(ours[:40], ref, rtol=1e-4, atol=1e-6)
    assert np.all(ours[40:] == 0)


def test_initial_log_scales_matches_reference_formula(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    s = np.asarray(initial_log_scales(jnp.asarray(pts)))
    d2 = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
    ref = np.log(np.sqrt(np.maximum(d2, 1e-7)))
    np.testing.assert_allclose(s, np.tile(ref[:, None], (1, 3)), rtol=1e-5)


# ------------------------------------------------------------------ SSIM

def _torch_ssim(a, b):
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss_utils import ssim as ref_ssim
    return float(ref_ssim(torch.from_numpy(a), torch.from_numpy(b)))


def test_ssim_matches_reference(rng):
    a = rng.uniform(size=(3, 40, 56)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ssim_identity(rng):
    a = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999


# ---------------------------------------------------------------- losses

def test_rgb_loss_matches_reference(rng):
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    from utils.loss_utils import rgb_loss_func
    a = rng.uniform(size=(3, 40, 48)).astype(np.float32)
    b = rng.uniform(size=(3, 40, 48)).astype(np.float32)
    ours = float(losses.rgb_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(rgb_loss_func(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pearson_depth_loss(rng):
    a = rng.uniform(1.0, 2.0, size=(32, 32)).astype(np.float32)
    # perfectly correlated -> loss 0; anti-correlated -> 2
    assert float(losses.pearson_depth_loss(jnp.asarray(a),
                                           jnp.asarray(2 * a + 1))) < 1e-4
    assert float(losses.pearson_depth_loss(jnp.asarray(a),
                                           jnp.asarray(-a))) > 1.99


def test_local_pearson_loss_runs(rng):
    a = jnp.asarray(rng.uniform(1, 2, (256, 320)).astype(np.float32))
    b = a * 3.0 + 0.5
    out = losses.local_pearson_loss(a, b, jax.random.PRNGKey(0))
    assert float(out) < 1e-3


def test_flow_projection_loss_zero_at_true_pose(rng):
    """With ground-truth geometry the induced flow equals the true flow."""
    cam = Camera(height=64, width=80, fx=70.0, fy=70.0, cx=40.0, cy=32.0)
    depth = jnp.asarray(rng.uniform(1.0, 2.0, (64, 80)).astype(np.float32))
    w2c_prev = jnp.eye(4)
    q = jnp.asarray([1.0, 0.01, -0.005, 0.02])
    t = jnp.asarray([0.02, -0.01, 0.03])
    w2c_cur = build_w2c(q, t)

    # true flow induced by the motion
    from freesurgs_tpu.core.camera import backproject, pixel_grid, project
    from freesurgs_tpu.core.transforms import transform_points
    pts = backproject(depth, cam)
    proj, _ = project(transform_points(w2c_cur, pts), cam)
    xg, yg = pixel_grid(64, 80)
    flow = (proj - jnp.stack([xg.reshape(-1), yg.reshape(-1)], 1))
    flow = flow.T.reshape(2, 64, 80)

    loss_true = losses.flow_projection_loss(depth, w2c_prev, w2c_cur, flow,
                                            cam)
    loss_wrong = losses.flow_projection_loss(
        depth, w2c_prev, build_w2c(q, t + 0.05), flow, cam)
    assert float(loss_true) < 1e-4
    assert float(loss_wrong) > 10 * float(loss_true)


# ------------------------------------------------------------------ adam

def test_adam_matches_torch(rng):
    import torch
    p_np = rng.normal(size=(13, 3)).astype(np.float32)
    grads = [rng.normal(size=(13, 3)).astype(np.float32) for _ in range(7)]

    p_t = torch.nn.Parameter(torch.from_numpy(p_np.copy()))
    opt = torch.optim.Adam([p_t], lr=3e-3, eps=1e-15)
    for g in grads:
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g)
        opt.step()

    params = {"p": jnp.asarray(p_np)}
    state = optim.adam_init(params)
    for g in grads:
        upd, state = optim.adam_update({"p": jnp.asarray(g)}, state,
                                       {"p": 3e-3})
        params = optim.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["p"]),
                               p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_surgery_zeroes_moments(rng):
    params = {"p": jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))}
    state = optim.adam_init(params)
    upd, state = optim.adam_update(
        {"p": jnp.ones((8, 2))}, state, {"p": 1e-2})
    mask = jnp.asarray([False] * 4 + [True] * 4)
    state2 = optim.surgery_mask_moments(state, mask)
    assert np.all(np.asarray(state2.mu["p"])[4:] == 0)
    assert np.all(np.asarray(state2.mu["p"])[:4]
                  == np.asarray(state.mu["p"])[:4])


def test_expon_lr_endpoints():
    lr0 = float(optim.expon_lr(0, 1.6e-4, 1.6e-6, 30000))
    lrN = float(optim.expon_lr(30000, 1.6e-4, 1.6e-6, 30000))
    np.testing.assert_allclose(lr0, 1.6e-4, rtol=1e-5)
    np.testing.assert_allclose(lrN, 1.6e-6, rtol=1e-5)


def test_tracking_lr_schedule():
    lrs = [float(optim.tracking_lr(i, 50)) for i in range(50)]
    assert lrs[0] == pytest.approx(0.005)
    assert lrs[20] == pytest.approx(0.0025)
    assert lrs[40] == pytest.approx(0.00125)
