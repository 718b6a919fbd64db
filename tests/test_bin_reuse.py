"""Binning-layout amortization (ops/raster_pallas.BinState).

The exactness contract under reuse (BinState docstring): pixel membership
is enforced in-kernel against the FRESH 16px snug rect and alpha cutoff,
so a stale layout reproduces the fresh render exactly whenever every
gaussian's current coverage is contained in its binned coverage, and the
custom_vjp consumes the same layout so gradients are the exact VJP of
whatever forward was computed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.ops.render import render
from freesurgs_tpu.ops.raster_pallas import zero_bin_state
from freesurgs_tpu.ops.render import raster_config

from test_pallas_raster import make_scene

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
KW = dict(impl="pallas_interpret", max_instances=4096)


def _bins0(n):
    return zero_bin_state(n, raster_config(CAM, 4096, n,
                                           "pallas_interpret"))


def test_reuse_same_params_identical(rng):
    args = make_scene(rng, 150)
    fresh = render(*args, jnp.eye(4), CAM, **KW)
    out1 = render(*args, jnp.eye(4), CAM, bins=_bins0(150),
                  rebin=jnp.bool_(True), **KW)
    out2 = render(*args, jnp.eye(4), CAM, bins=out1["bins"],
                  rebin=jnp.bool_(False), **KW)
    np.testing.assert_array_equal(np.asarray(fresh["render"]),
                                  np.asarray(out1["render"]))
    np.testing.assert_array_equal(np.asarray(out1["render"]),
                                  np.asarray(out2["render"]))
    np.testing.assert_array_equal(np.asarray(out1["render_dep"]),
                                  np.asarray(out2["render_dep"]))


def test_reuse_shrunk_coverage_exact(rng):
    """Opacity decrease only shrinks snug coverage => contained in the
    stale layout => reuse composites the SAME (pixel, gaussian) set. The
    fresh layout drops the now-empty instances, shifting chunk
    boundaries, so results agree to float reassociation (~1e-7), not
    bit-exactly."""
    args = list(make_scene(rng, 150))
    out1 = render(*args, jnp.eye(4), CAM, bins=_bins0(150),
                  rebin=jnp.bool_(True), **KW)
    args[3] = args[3] - 0.5   # logit opacity down => alpha down everywhere
    stale = render(*args, jnp.eye(4), CAM, bins=out1["bins"],
                   rebin=jnp.bool_(False), **KW)
    fresh = render(*args, jnp.eye(4), CAM, **KW)
    np.testing.assert_allclose(np.asarray(stale["render"]),
                               np.asarray(fresh["render"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stale["final_T"]),
                               np.asarray(fresh["final_T"]), atol=1e-6)


def test_reuse_small_motion_close(rng):
    """Sub-pixel motion between rebins: the stale render may lose slivers
    at bin borders but must stay close to fresh."""
    args = list(make_scene(rng, 150))
    out1 = render(*args, jnp.eye(4), CAM, bins=_bins0(150),
                  rebin=jnp.bool_(True), **KW)
    args[0] = args[0] + jnp.asarray([2e-4, -1e-4, 0.0])
    stale = render(*args, jnp.eye(4), CAM, bins=out1["bins"],
                   rebin=jnp.bool_(False), **KW)
    fresh = render(*args, jnp.eye(4), CAM, **KW)
    assert float(jnp.max(jnp.abs(stale["render"] - fresh["render"]))) < 1e-2


def test_stale_gradients_are_exact_vjp(rng):
    """Gradients under a stale layout must be the exact VJP of the stale
    forward: finite differences through the SAME fixed bins must match."""
    args = list(make_scene(rng, 60))
    out1 = render(*args, jnp.eye(4), CAM, bins=_bins0(60),
                  rebin=jnp.bool_(True), **KW)
    bins = out1["bins"]
    args[0] = args[0] + jnp.asarray([3e-4, -2e-4, 1e-4])  # go stale

    def loss(lo, means):
        out = render(means, args[1], args[2], lo, args[4], jnp.eye(4),
                     CAM, bins=bins, rebin=jnp.bool_(False), **KW)
        return jnp.mean((out["render"] - 0.3) ** 2)

    glo, gm = jax.grad(loss, argnums=(0, 1))(args[3], args[0])
    eps = 5e-3
    d = jnp.asarray(rng.normal(size=glo.shape).astype(np.float32))
    fd = (loss(args[3] + eps * d, args[0])
          - loss(args[3] - eps * d, args[0])) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(glo, d)), float(fd),
                               rtol=1e-1, atol=2e-5)
    dm = jnp.asarray(rng.normal(size=gm.shape).astype(np.float32)) * 1e-1
    fdm = (loss(args[3], args[0] + eps * dm)
           - loss(args[3], args[0] - eps * dm)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(gm, dm)), float(fdm),
                               rtol=1e-1, atol=2e-5)


def test_rebin_flag_recovers_fresh(rng):
    """After drift, rebin=True must give exactly the fresh result."""
    args = list(make_scene(rng, 100))
    out1 = render(*args, jnp.eye(4), CAM, bins=_bins0(100),
                  rebin=jnp.bool_(True), **KW)
    args[0] = args[0] + jnp.asarray([0.05, 0.02, -0.01])  # big move
    out2 = render(*args, jnp.eye(4), CAM, bins=out1["bins"],
                  rebin=jnp.bool_(True), **KW)
    fresh = render(*args, jnp.eye(4), CAM, **KW)
    np.testing.assert_array_equal(np.asarray(out2["render"]),
                                  np.asarray(fresh["render"]))


def test_mapping_amortized_rebin_quality():
    """rebin_every=5 must train essentially as well as rebin_every=1 on a
    synthetic scene (stale layouts only lose bin-border slivers)."""
    from freesurgs_tpu.data.synthetic import make_scene as make_video
    from freesurgs_tpu.models.gaussians import GaussianField  # noqa: F401
    from freesurgs_tpu.train.optim import adam_init
    from freesurgs_tpu.train.steps import (MappingState, TrainConfig,
                                           make_jitted_mapping)
    from freesurgs_tpu.ops.render import render as rnd
    from test_training_steps import field_from_scene

    scene = make_video(num_frames=2, n_gaussians=300, height=64, width=80)

    def run(rebin_every):
        field = field_from_scene(scene, perturb=0.01)
        cfg = TrainConfig(max_instances=8192, impl="pallas_interpret",
                          rebin_every=rebin_every)
        opt = adam_init(field.param_dict())
        mapping = make_jitted_mapping(scene.cam, cfg)
        T, H, W = 2, scene.cam.height, scene.cam.width
        st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(0),
                          jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
        st2, aux = mapping(
            st, scene.colors, scene.monodeps, scene.gt_w2c,
            jnp.zeros((25,), jnp.int32), jnp.zeros((2,), jnp.int32),
            jnp.int32(1), cam=scene.cam, cfg=cfg, two_views=False,
            sh_degree=0, densify_enabled=False)
        f = st2.field
        out = rnd(f.means, f.quats, f.log_scales, f.logit_opacity, f.sh,
                  scene.gt_w2c[0], scene.cam, active=f.active,
                  impl="pallas_interpret", max_instances=8192)
        mse = jnp.mean((jnp.clip(out["render"], 0, 1)
                        - scene.colors[0]) ** 2)
        return float(-10 * jnp.log10(mse)), float(aux["loss"])

    p_exact, l_exact = run(1)
    p_amort, l_amort = run(5)
    assert np.isfinite(l_amort)
    assert p_amort > p_exact - 0.3, (p_exact, p_amort)


def test_tracking_amortized_rebin_converges():
    """Tracking with rebin_tracking_every=2 must still recover the pose."""
    from freesurgs_tpu.data.synthetic import make_scene as make_video
    from freesurgs_tpu.train.steps import TrainConfig, tracking_loop
    from test_training_steps import field_from_scene, pose_errors

    scene = make_video(num_frames=3, n_gaussians=400, height=64, width=80)
    field = field_from_scene(scene)
    cfg = TrainConfig(tracking_iters=60, max_instances=8192,
                      impl="pallas_interpret", rebin_tracking_every=2)
    t = 1
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
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


def test_tracking_rebin_every5_matches_every1():
    """The production amortization target (rebin_tracking_every=5, the
    progressive wall-clock lever — binning at full-res instance capacity
    dominates the tracking iteration) must recover the pose essentially
    as well as rebinning every iteration: final translation error within
    1.5x of the every-iteration run (both start from a const-velocity-
    style perturbed pose)."""
    from freesurgs_tpu.data.synthetic import make_scene as make_video
    from freesurgs_tpu.train.steps import TrainConfig, tracking_loop
    from test_training_steps import field_from_scene, pose_errors

    scene = make_video(num_frames=3, n_gaussians=400, height=64, width=80)
    field = field_from_scene(scene)
    t = 1
    q0, t0 = scene.gt_quats[t - 1], scene.gt_trans[t - 1]
    rigid = jnp.ones((scene.cam.height, scene.cam.width))

    def run(every):
        cfg = TrainConfig(tracking_iters=60, max_instances=8192,
                          impl="pallas_interpret",
                          rebin_tracking_every=every)
        q1, t1, m = tracking_loop(
            field, q0, t0, scene.colors[t], scene.depths[t - 1],
            scene.gt_w2c[t - 1], scene.flows_fw[t - 1], rigid, scene.cam,
            cfg, sh_degree=0)
        assert np.isfinite(float(m["loss"]))
        return pose_errors(q1, t1, scene.gt_quats[t], scene.gt_trans[t])

    dq1, dt1 = run(1)
    dq5, dt5 = run(5)
    # With the GN flow-PnP init (tracking_gn_iters default) both runs land
    # at the sub-1e-3 noise floor of the photometric fine-tune, where a
    # pure ratio is meaningless — the absolute floors below are ~30x
    # tighter than the pre-GN errors this test was written against.
    assert dt5 < 1.5 * dt1 + 5e-4, (dt1, dt5)
    assert dq5 < 1.5 * dq1 + 5e-4, (dq1, dq5)


def test_global_stage_frame_grouping_quality():
    """The global stage groups each chunk's random frame visits into runs
    (train/loop.py) so the BinState carry pays off. Sorted-run visiting
    order with rebin_every=8 must train as well as i.i.d. order with
    rebin_every=1."""
    from freesurgs_tpu.data.synthetic import make_scene as make_video
    from freesurgs_tpu.train.optim import adam_init
    from freesurgs_tpu.train.steps import (MappingState, TrainConfig,
                                           make_jitted_mapping)
    from freesurgs_tpu.ops.render import render as rnd
    from test_training_steps import field_from_scene

    scene = make_video(num_frames=3, n_gaussians=300, height=64, width=80)
    rng = np.random.default_rng(3)
    ts = rng.choice(3, size=36)

    def run(order, rebin_every):
        field = field_from_scene(scene, perturb=0.01)
        cfg = TrainConfig(max_instances=8192, impl="pallas_interpret",
                          rebin_every=rebin_every)
        opt = adam_init(field.param_dict())
        mapping = make_jitted_mapping(scene.cam, cfg)
        T, H, W = 3, scene.cam.height, scene.cam.width
        st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(0),
                          jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
        st2, aux = mapping(
            st, scene.colors, scene.monodeps, scene.gt_w2c,
            jnp.asarray(order, jnp.int32), jnp.zeros((2,), jnp.int32),
            jnp.int32(1), cam=scene.cam, cfg=cfg, two_views=False,
            sh_degree=0, densify_enabled=False)
        f = st2.field
        ps = []
        for t in range(3):
            out = rnd(f.means, f.quats, f.log_scales, f.logit_opacity,
                      f.sh, scene.gt_w2c[t], scene.cam, active=f.active,
                      impl="pallas_interpret", max_instances=8192)
            mse = jnp.mean((jnp.clip(out["render"], 0, 1)
                            - scene.colors[t]) ** 2)
            ps.append(float(-10 * jnp.log10(mse)))
        assert np.isfinite(float(aux["loss"]))
        return np.mean(ps)

    p_iid = run(ts, 1)
    p_grouped = run(np.sort(ts), 8)
    # Measured attribution on this fixture (36 iters, 3 frames, ~47 dB —
    # an already-converged micro-regime that amplifies recency): visit
    # order costs ~0.4 dB, layout staleness ~0.45 dB. Gate at 1 dB:
    # catches real regressions (wrong bins would cost tens of dB) while
    # tolerating the documented small effects.
    assert p_grouped > p_iid - 1.0, (p_iid, p_grouped)


def test_two_view_keyframe_grouping_quality():
    """Two-view (progressive) mapping with the keyframe-view BinState
    carry: presampled value-grouped keyframe draws + layout reuse
    (rebin_every=4) must train as well as per-iteration i.i.d. keyframe
    sampling with rebin_every=1, and the densify stats view stays live
    (max_radii2d accumulates)."""
    from freesurgs_tpu.data.synthetic import make_scene as make_video
    from freesurgs_tpu.train.optim import adam_init
    from freesurgs_tpu.train.steps import (MappingState, TrainConfig,
                                           make_jitted_mapping)
    from freesurgs_tpu.ops.render import render as rnd
    from test_training_steps import field_from_scene

    scene = make_video(num_frames=4, n_gaussians=300, height=64, width=80)

    def run(rebin_every):
        field = field_from_scene(scene, perturb=0.01)
        cfg = TrainConfig(max_instances=8192, impl="pallas_interpret",
                          rebin_every=rebin_every)
        opt = adam_init(field.param_dict())
        mapping = make_jitted_mapping(scene.cam, cfg)
        T, H, W = 4, scene.cam.height, scene.cam.width
        st = MappingState(field, opt, jnp.int32(0), jax.random.PRNGKey(0),
                          jnp.zeros((T, H, W)), jnp.zeros((T, 3, H, W)))
        kf = jnp.asarray([0, 1, 2, 0], jnp.int32)   # 3 live keyframes
        st2, aux = mapping(
            st, scene.colors, scene.monodeps, scene.gt_w2c,
            jnp.full((30,), 3, jnp.int32), kf, jnp.int32(3),
            cam=scene.cam, cfg=cfg, two_views=True,
            sh_degree=0, densify_enabled=False)
        f = st2.field
        assert np.isfinite(float(aux["loss"]))
        assert float(jnp.max(f.max_radii2d)) > 0   # stats view was live
        ps = []
        for t in range(4):
            out = rnd(f.means, f.quats, f.log_scales, f.logit_opacity,
                      f.sh, scene.gt_w2c[t], scene.cam, active=f.active,
                      impl="pallas_interpret", max_instances=8192)
            mse = jnp.mean((jnp.clip(out["render"], 0, 1)
                            - scene.colors[t]) ** 2)
            ps.append(float(-10 * jnp.log10(mse)))
        return np.mean(ps)

    p_exact = run(1)
    p_grouped = run(4)
    # Same tolerance rationale as the global-stage grouping gate above.
    assert p_grouped > p_exact - 1.0, (p_exact, p_grouped)


def test_snug_rect_degenerate_conic_no_wrap():
    """A near-degenerate conic whose f32 det cancels to <= 0 hits the
    1e-24 det floor in snug_tile_rect and produces an astronomically
    large ellipse half-width; the float->int cast of (px + rx)/TILE must
    NOT wrap past INT_MAX into a huge/negative tile count (it corrupted
    the binner's instance totals on 2/46 frames of the first full 30k
    run). The correct fallback is the grid-clipped CUDA rect (no snug
    shrink)."""
    from freesurgs_tpu.ops.projection import ProjectedGaussians
    from freesurgs_tpu.ops.raster_pallas import snug_tile_rect

    # conic with f32-cancelling determinant: A*C == B*B exactly in f32
    A, B, C = 4.0, 2.0, 1.0            # det = 4*1 - 4 = 0 -> floor 1e-24
    proj = ProjectedGaussians(
        mean2d=jnp.asarray([[40.0, 24.0]]),
        conic=jnp.asarray([[A, B, C]]),
        depth=jnp.asarray([1.0]),
        radius=jnp.asarray([10], jnp.int32),
        tile_rect=jnp.asarray([[1, 0, 4, 3]], jnp.int32),  # CUDA rect
        tiles_touched=jnp.asarray([9], jnp.int32),
    )
    snug = snug_tile_rect(proj, jnp.asarray([0.9]))
    tiles = int(snug.tiles_touched[0])
    rect = np.asarray(snug.tile_rect[0])
    assert tiles == 9, (tiles, rect)            # falls back to CUDA rect
    np.testing.assert_array_equal(rect, [1, 0, 4, 3])
