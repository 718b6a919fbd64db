import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import build_w2c
from freesurgs_tpu.core.warp import (flow_warp, forward_backward_occlusion,
                                     median_depth)
from freesurgs_tpu.data.synthetic import flow_from_depth, make_scene
from freesurgs_tpu.models import pose as pm
from freesurgs_tpu.train import losses
from freesurgs_tpu.train.keyframes import (keyframe_overlap_scores,
                                           select_overlap_keyframes)

CAM = Camera(height=48, width=64, fx=55.0, fy=55.0, cx=32.0, cy=24.0)


def test_sampson_zero_for_true_matches(rng):
    scene = make_scene(num_frames=3, n_gaussians=200, height=48, width=64,
                       seed=1)
    poses = pm.PoseTable(quats=scene.gt_quats, trans=scene.gt_trans)
    K = jnp.asarray(scene.cam.intrinsic_matrix())
    # flow derived from true geometry -> sampson distance ~ 0
    _, smap = pm.epipolar_rigidity(poses, 0, 1, scene.flows_fw[0],
                                   scene.cam, K)
    assert float(jnp.median(smap)) < 0.05
    # corrupted flow -> large distances
    bad_flow = scene.flows_fw[0] + 15.0
    _, smap_bad = pm.epipolar_rigidity(poses, 0, 1, bad_flow, scene.cam, K)
    assert float(jnp.median(smap_bad)) > 10 * max(
        float(jnp.median(smap)), 1e-6)


def test_adaptive_threshold():
    x = jnp.asarray(np.concatenate([np.zeros(990), np.full(10, 100.0)]))
    m = pm.adaptive_threshold_mask(x)
    assert not bool(m[-1])
    assert bool(m[0])


def test_const_velocity_extrapolation():
    poses = pm.identity_poses(4)
    poses = poses.set_frame(1, jnp.asarray([1.0, 0, 0, 0]),
                            jnp.asarray([0.1, 0.0, 0.0]))
    poses = pm.const_velocity_init(poses, 2)
    np.testing.assert_allclose(np.asarray(poses.trans[2]), [0.2, 0, 0],
                               atol=1e-6)


def test_pnp_pose_init_recovers_pose():
    scene = make_scene(num_frames=3, n_gaussians=300, height=64, width=80,
                       seed=2)
    poses = pm.identity_poses(3)
    poses = poses.set_frame(0, scene.gt_quats[0], scene.gt_trans[0])
    poses = pm.pnp_pose_init(poses, 1, scene.flows_fw[0], scene.depths[0],
                             scene.gt_w2c[0], scene.cam)
    est = np.asarray(poses.w2c(1))
    gt = np.asarray(scene.gt_w2c[1])
    assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.01
    assert np.abs(est[:3, :3] - gt[:3, :3]).max() < 0.01


def test_keyframe_overlap(rng):
    # image large enough that the edge-20 interior dominates
    cam = Camera(height=128, width=160, fx=140.0, fy=140.0, cx=80.0,
                 cy=64.0)
    depth = jnp.full((cam.height, cam.width), 1.5)
    cur = jnp.eye(4)
    kfs = jnp.stack([
        jnp.eye(4),                                   # same view: high
        build_w2c(jnp.asarray([1.0, 0, 0, 0]),
                  jnp.asarray([5.0, 0.0, 0.0])),      # far off: low
    ])
    scores = keyframe_overlap_scores(depth, cur, kfs, cam,
                                     jax.random.PRNGKey(0))
    assert float(scores[0]) > 0.4
    assert float(scores[1]) < 0.05
    sel = select_overlap_keyframes(scores, jax.random.PRNGKey(1), 1)
    assert int(sel[0]) == 0


def test_flow_warp_identity(rng):
    img = jnp.asarray(rng.uniform(size=(3, 20, 24)).astype(np.float32))
    out = flow_warp(img, jnp.zeros((2, 20, 24)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_flow_warp_shift(rng):
    img = jnp.asarray(rng.uniform(size=(1, 10, 12)).astype(np.float32))
    flow = jnp.zeros((2, 10, 12)).at[0].set(1.0)  # sample one pixel right
    out = flow_warp(img, flow)
    np.testing.assert_allclose(np.asarray(out[0, :, :-1]),
                               np.asarray(img[0, :, 1:]), atol=1e-6)


def test_fb_occlusion_consistent_flow():
    scene = make_scene(num_frames=2, n_gaussians=200, height=48, width=64,
                       seed=4)
    fw = scene.flows_fw[0]
    bw = -flow_warp(fw, fw)  # approximate backward flow
    mask = forward_backward_occlusion(fw, bw)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert frac > 0.6  # approx bw flow + real occlusion edges
    bad = forward_backward_occlusion(fw, bw + 3.0)
    assert float(jnp.mean(bad.astype(jnp.float32))) < frac - 0.2


def test_median_depth():
    d = jnp.asarray([[0.0, 1.0], [3.0, 5.0]])
    assert float(median_depth(d)) in (1.0, 3.0)


def test_scale_shift_invariant_loss(rng):
    gt = jnp.asarray(rng.uniform(1, 2, (1, 32, 32)).astype(np.float32))
    pred = 3.0 * gt + 0.7  # exact affine -> loss 0
    mask = jnp.ones_like(gt)
    assert float(losses.scale_shift_invariant_loss(pred, gt, mask)) < 1e-4
    noisy = pred + jnp.asarray(
        rng.normal(size=pred.shape).astype(np.float32) * 0.3)
    assert float(losses.scale_shift_invariant_loss(noisy, gt, mask)) > 1e-3
