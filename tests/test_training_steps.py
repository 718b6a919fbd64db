"""Integration tests on synthetic scenes: tracking recovers poses,
mapping improves PSNR (BASELINE configs 2-3, miniaturized)."""

import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.transforms import build_w2c
from freesurgs_tpu.data.synthetic import make_scene
from freesurgs_tpu.models.gaussians import GaussianField
from freesurgs_tpu.train.optim import adam_init
from freesurgs_tpu.train.steps import (TrainConfig, make_jitted_mapping,
                                       make_jitted_tracking, tracking_loop)


def field_from_scene(scene, cap=1024, perturb=0.0, seed=0):
    n = scene.means.shape[0]
    rng = np.random.default_rng(seed)

    def pad(x, extra_dims=()):
        shape = (cap,) + x.shape[1:]
        out = jnp.zeros(shape, x.dtype)
        return out.at[:n].set(x)

    means = scene.means
    sh = scene.sh
    if perturb:
        means = means + jnp.asarray(
            rng.normal(size=means.shape).astype(np.float32)) * perturb
        sh = sh + jnp.asarray(
            rng.normal(size=sh.shape).astype(np.float32)) * perturb * 3
    quats = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
    quats = quats.at[:n].set(scene.quats)
    return GaussianField(
        means=pad(means), quats=quats, log_scales=pad(scene.log_scales),
        logit_opacity=pad(scene.logit_opacity), sh_dc=pad(sh[:, :1]),
        sh_rest=jnp.zeros((cap, 0, 3), jnp.float32),
        active=jnp.zeros((cap,), bool).at[:n].set(True),
        max_radii2d=jnp.zeros((cap,)), grad_accum=jnp.zeros((cap,)),
        grad_denom=jnp.zeros((cap,)),
        scene_radius=jnp.asarray(1.5), max_sh_degree=0)


def pose_errors(q, t, q_gt, t_gt):
    q = np.asarray(q) / np.linalg.norm(np.asarray(q))
    q_gt = np.asarray(q_gt) / np.linalg.norm(np.asarray(q_gt))
    dq = min(np.linalg.norm(q - q_gt), np.linalg.norm(q + q_gt))
    dt = np.linalg.norm(np.asarray(t) - np.asarray(t_gt))
    return dq, dt


def test_tracking_recovers_pose():
    scene = make_scene(num_frames=3, n_gaussians=400, height=64, width=80)
    field = field_from_scene(scene)
    cfg = TrainConfig(tracking_iters=60, max_instances=8192,
                      impl="pallas_interpret")
    t = 1
    # init at previous frame's pose (reference copy-previous init for t=1)
    q0 = scene.gt_quats[t - 1]
    t0 = scene.gt_trans[t - 1]
    dq0, dt0 = pose_errors(q0, t0, scene.gt_quats[t], scene.gt_trans[t])

    rigid = jnp.ones((scene.cam.height, scene.cam.width))
    q1, t1, metrics = tracking_loop(
        field, q0, t0, scene.colors[t], scene.depths[t - 1],
        scene.gt_w2c[t - 1], scene.flows_fw[t - 1], rigid, scene.cam, cfg,
        sh_degree=0)
    dq1, dt1 = pose_errors(q1, t1, scene.gt_quats[t], scene.gt_trans[t])
    assert np.isfinite(float(metrics["loss"]))
    assert dt1 < 0.55 * dt0, (dt0, dt1)
    assert dq1 < 0.8 * dq0 + 1e-4, (dq0, dq1)


def test_mapping_improves_psnr():
    scene = make_scene(num_frames=2, n_gaussians=300, height=64, width=80)
    field = field_from_scene(scene, perturb=0.01)
    cfg = TrainConfig(max_instances=8192, impl="pallas_interpret")
    opt = adam_init(field.param_dict())
    w2c_all = scene.gt_w2c
    keyframes = jnp.zeros((2,), jnp.int32)

    mapping = make_jitted_mapping(scene.cam, cfg)

    def psnr(f):
        from freesurgs_tpu.ops.render import render
        out = render(f.means, f.quats, f.log_scales, f.logit_opacity,
                     f.sh, w2c_all[0], scene.cam, active=f.active,
                     impl="pallas_interpret", max_instances=8192)
        mse = jnp.mean((jnp.clip(out["render"], 0, 1)
                        - scene.colors[0]) ** 2)
        return float(-10 * jnp.log10(mse))

    from freesurgs_tpu.train.steps import MappingState
    T, H, W = 2, scene.cam.height, scene.cam.width
    st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(0),
                      jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
    p0 = psnr(field)
    st2, aux = mapping(
        st, scene.colors, scene.monodeps, w2c_all,
        jnp.zeros((25,), jnp.int32), keyframes, jnp.int32(1),
        cam=scene.cam, cfg=cfg, two_views=False, sh_degree=0,
        densify_enabled=False)
    field2 = st2.field
    p1 = psnr(field2)
    assert np.isfinite(float(aux["loss"]))
    assert p1 > p0 + 1.0, (p0, p1)


def test_mapping_two_views_and_densify_runs():
    scene = make_scene(num_frames=3, n_gaussians=200, height=64, width=80)
    field = field_from_scene(scene, perturb=0.02)
    cfg = TrainConfig(max_instances=8192, impl="pallas_interpret",
                      densify_interval=10)
    opt = adam_init(field.param_dict())
    keyframes = jnp.asarray([0, 1], jnp.int32)
    mapping = make_jitted_mapping(scene.cam, cfg)
    from freesurgs_tpu.train.steps import MappingState
    T, H, W = 3, scene.cam.height, scene.cam.width
    st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(1),
                      jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
    st2, aux = mapping(
        st, scene.colors, scene.monodeps, scene.gt_w2c,
        jnp.full((12,), 2, jnp.int32), keyframes, jnp.int32(2),
        cam=scene.cam, cfg=cfg, two_views=True, sh_degree=0,
        densify_enabled=True)
    assert int(aux["iteration"]) == 12
    assert int(aux["num_active"]) > 0
    assert np.isfinite(float(aux["loss"]))
    # current frame's caches were updated
    assert float(jnp.abs(st2.pred_depths[2]).max()) > 0
    assert float(jnp.abs(st2.pred_depths[0]).max()) == 0


def test_mapping_overlap_keyframe_policy():
    """keyframe_policy="overlap" (reference keyframe_selection_overlap,
    pose_optimizer.py:534-577) runs and trains like uniform selection."""
    scene = make_scene(num_frames=4, n_gaussians=200, height=64, width=80)
    field = field_from_scene(scene, perturb=0.02)
    opt = adam_init(field.param_dict())
    keyframes = jnp.asarray([0, 1, 2, 0], jnp.int32)
    from freesurgs_tpu.train.steps import MappingState
    T, H, W = 4, scene.cam.height, scene.cam.width
    st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(1),
                      jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
    results = {}
    for policy in ("uniform", "overlap"):
        cfg = TrainConfig(max_instances=8192, impl="pallas_interpret",
                          keyframe_policy=policy)
        mapping = make_jitted_mapping(scene.cam, cfg)
        st2, aux = mapping(
            st, scene.colors, scene.monodeps, scene.gt_w2c,
            jnp.full((8,), 3, jnp.int32), keyframes, jnp.int32(3),
            cam=scene.cam, cfg=cfg, two_views=True, sh_degree=0,
            densify_enabled=False)
        assert np.isfinite(float(aux["loss"])), policy
        results[policy] = float(aux["loss"])
    # both policies optimize the same objective on overlapping views
    assert abs(results["uniform"] - results["overlap"]) < 10.0
