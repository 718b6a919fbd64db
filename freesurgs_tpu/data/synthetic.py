"""Synthetic video generator for end-to-end tests without SCARED data.

Builds a random Gaussian scene, a smooth ground-truth camera trajectory,
and renders the frames with the framework's own (oracle or pallas)
renderer. Optical flow is derived analytically from rendered depth + the
ground-truth relative poses (the same quantity the reference precomputes
with RAFT), and "monocular depth" is the true rendered depth min-max
normalized into [0.5, 1.5] exactly like the reference's preprocessing
(``scene/pose_optimizer.py:406-407``).

This gives BASELINE configs 2-3 (pose-only and joint optimization) a
self-contained ground truth with known ATE == 0 at the optimum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, backproject, pixel_grid, project
from ..core.transforms import build_w2c, invert_se3, transform_points
from ..ops.render import render


class SyntheticScene(NamedTuple):
    cam: Camera
    means: jnp.ndarray
    quats: jnp.ndarray
    log_scales: jnp.ndarray
    logit_opacity: jnp.ndarray
    sh: jnp.ndarray
    gt_w2c: jnp.ndarray        # (T, 4, 4)
    gt_quats: jnp.ndarray      # (T, 4)
    gt_trans: jnp.ndarray      # (T, 3)
    colors: jnp.ndarray        # (T, 3, H, W) rendered frames
    depths: jnp.ndarray        # (T, H, W) true rendered depth
    monodeps: jnp.ndarray      # (T, H, W) normalized depth prior
    flows_fw: jnp.ndarray      # (T-1, 2, H, W) analytic flow t -> t+1


def _smooth_trajectory(num_frames: int, seed: int, rot_mag=0.02,
                       trans_mag=0.015, revert=0.06):
    """Smooth mean-reverting camera path (Ornstein-Uhlenbeck on a small
    rotation vector + translation).

    A pure momentum walk accumulates ~sqrt(T) drift: over a 60-frame
    full-length sequence the camera rotated >1 rad and left the scene
    entirely (frames went blank white, which silently destroyed a full
    training run — opacity gradients vanish and the reset+prune cycle
    extinguishes the field). The reversion term bounds the excursion to
    ~rot_mag/revert rad (~0.3) and keeps the Gaussian blob in frame for
    arbitrarily long sequences while frame-to-frame motion stays the
    same scale the tracking tests were tuned on.
    """
    rng = np.random.default_rng(seed)
    qs = [np.array([1.0, 0, 0, 0])]
    ts = [np.zeros(3)]
    v = np.zeros(3)   # accumulated small-angle rotation vector (q[1:4])
    p = np.zeros(3)
    dq = rng.normal(size=3) * rot_mag
    dt = rng.normal(size=3) * trans_mag
    for _ in range(1, num_frames):
        dq = 0.9 * dq + rng.normal(size=3) * rot_mag * 0.3 - revert * v
        dt = 0.9 * dt + rng.normal(size=3) * trans_mag * 0.3 - revert * p
        v = v + dq
        p = p + dt
        q = np.concatenate([[1.0], v])
        q = q / np.linalg.norm(q)
        qs.append(q)
        ts.append(p.copy())
    return (jnp.asarray(np.stack(qs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


def flow_from_depth(depth_t, w2c_t, w2c_t1, cam: Camera):
    """Analytic forward flow t -> t+1 from depth of frame t and both poses."""
    pts_w = backproject(depth_t, cam, invert_se3(w2c_t))
    proj, _ = project(transform_points(w2c_t1, pts_w), cam)
    xg, yg = pixel_grid(cam.height, cam.width)
    pix = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    return (proj - pix).T.reshape(2, cam.height, cam.width)


def make_scene(num_frames: int = 8, n_gaussians: int = 600,
               height: int = 64, width: int = 80, seed: int = 0,
               impl: str = "oracle",
               scale_range: tuple = (0.02, 0.06),
               max_instances: int = 0) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    cam = Camera(height=height, width=width, fx=width * 1.1,
                 fy=width * 1.1, cx=width / 2, cy=height / 2)
    n = n_gaussians
    means = np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
        rng.uniform(1.0, 2.5, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(*scale_range,
                                    (n, 3))).astype(np.float32)
    logit_op = rng.uniform(1.0, 4.0, n).astype(np.float32)
    from ..core.sh import rgb2sh
    sh = np.asarray(rgb2sh(jnp.asarray(
        rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32))))[:, None, :]

    gt_q, gt_t = _smooth_trajectory(num_frames, seed + 1)
    gt_w2c = build_w2c(gt_q, gt_t)

    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(log_scales),
            jnp.asarray(logit_op), jnp.asarray(sh))

    colors, depths = [], []
    for t in range(num_frames):
        out = render(*args, gt_w2c[t], cam, impl=impl,
                     max_instances=max_instances)
        if t == 0 and "overflow" in out:
            assert int(out["overflow"]) == 0, (
                f"instance overflow {int(out['overflow'])}: raise "
                "max_instances or shrink scale_range")
        colors.append(jnp.clip(out["render"], 0.0, 1.0))
        depths.append(out["render_dep"])
    colors = jnp.stack(colors)
    depths = jnp.stack(depths)

    # reference mono-depth normalization: [0.5, 1.5]
    dmin = depths.min(axis=(1, 2), keepdims=True)
    dmax = depths.max(axis=(1, 2), keepdims=True)
    monodeps = (depths - dmin) / jnp.maximum(dmax - dmin, 1e-8) + 0.5

    flows = jnp.stack([
        flow_from_depth(depths[t], gt_w2c[t], gt_w2c[t + 1], cam)
        for t in range(num_frames - 1)])

    return SyntheticScene(cam=cam, means=args[0], quats=args[1],
                          log_scales=args[2], logit_opacity=args[3],
                          sh=args[4], gt_w2c=gt_w2c, gt_quats=gt_q,
                          gt_trans=gt_t, colors=colors, depths=depths,
                          monodeps=monodeps, flows_fw=flows)


def make_nonrigid_scene(num_frames: int = 8, n_gaussians: int = 600,
                        height: int = 64, width: int = 80, seed: int = 0,
                        impl: str = "oracle",
                        scale_range: tuple = (0.02, 0.06),
                        max_instances: int = 0,
                        patch_amp: float = 0.02,
                        spec_speed: float = 0.02):
    """A scene with ADVERSARIAL non-rigid content for the rigidity mask.

    The paper's signature mechanism for surgical scenes — the Sampson-
    distance epipolar mask (reference ``scene/pose_optimizer.py:732-746``,
    threshold ``utils/general_utils.py:96-116``) — exists to exclude
    deforming tissue and moving specular highlights from tracking. The
    rigid synthetic stand-in can never make it fail, so this variant adds:

    - a DEFORMING PATCH: gaussians inside a ball get a shared sinusoidal
      sway (uniform per frame — so the induced image flow is exactly the
      projected 3D displacement, no approximation);
    - a MOVING SPECULAR HIGHLIGHT: a bright compact cluster drifting
      laterally across the scene with its own velocity, like a light
      glint crawling over wet tissue.

    The analytic flow tracks the TRUE scene motion (what a flow network
    estimates): each pixel's back-projection is displaced by its rendered
    non-rigid membership times the object's world displacement before
    reprojection — so non-rigid pixels carry epipolar-violating flow.

    Returns ``(SyntheticScene, aux)`` where aux has per-frame float
    memberships ``member_patch``/``member_spec`` (T, H, W) and the ground
    truth ``nonrigid_mask`` (T, H, W) bool (membership > 0.3) for mask
    precision/recall scoring.
    """
    rng = np.random.default_rng(seed)
    cam = Camera(height=height, width=width, fx=width * 1.1,
                 fy=width * 1.1, cx=width / 2, cy=height / 2)
    n = n_gaussians
    means = np.stack([
        rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
        rng.uniform(1.0, 2.5, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(*scale_range,
                                    (n, 3))).astype(np.float32)
    logit_op = rng.uniform(1.0, 4.0, n).astype(np.float32)
    from ..core.sh import rgb2sh
    sh = np.asarray(rgb2sh(jnp.asarray(
        rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32))))[:, None, :]

    # deforming patch: a ball in the central near field
    patch_center = np.array([0.15, -0.1, 1.4], np.float32)
    patch_sel = (np.linalg.norm(means - patch_center, axis=1)
                 < 0.3).astype(np.float32)
    sway_dir = np.array([0.8, 0.55, -0.25], np.float32)
    sway_dir /= np.linalg.norm(sway_dir)

    def patch_disp(t):
        # one period over ~10 frames; uniform over the patch
        return (patch_amp * np.sin(2 * np.pi * t / 10.0)
                * sway_dir).astype(np.float32)

    # specular highlight: a bright compact cluster with its own drift
    n_spec = 24
    spec_base = np.array([-0.3, 0.1, 1.3], np.float32)
    spec_vel = np.array([spec_speed, -0.4 * spec_speed, 0.0], np.float32)
    spec_local = (rng.normal(size=(n_spec, 3)) * 0.02).astype(np.float32)
    spec_quats = rng.normal(size=(n_spec, 4)).astype(np.float32)
    spec_ls = np.log(rng.uniform(0.01, 0.02,
                                 (n_spec, 3))).astype(np.float32)
    spec_op = np.full((n_spec,), 2.0, np.float32)
    spec_sh = np.asarray(rgb2sh(jnp.full((n_spec, 3), 0.98)))[:, None, :]

    def spec_pos(t):
        return spec_base + t * spec_vel

    gt_q, gt_t = _smooth_trajectory(num_frames, seed + 1)
    gt_w2c = build_w2c(gt_q, gt_t)

    all_quats = jnp.asarray(np.concatenate([quats, spec_quats]))
    all_ls = jnp.asarray(np.concatenate([log_scales, spec_ls]))
    all_op = jnp.asarray(np.concatenate([logit_op, spec_op]))
    all_sh = jnp.asarray(np.concatenate([sh, spec_sh]))
    # membership indicator colors: R = patch, G = specular
    ind = np.zeros((n + n_spec, 3), np.float32)
    ind[:n, 0] = patch_sel
    ind[n:, 1] = 1.0
    ind_sh = jnp.asarray(np.asarray(rgb2sh(jnp.asarray(ind)))[:, None, :])

    def means_at(t):
        m = means + patch_sel[:, None] * patch_disp(t)[None, :]
        return jnp.asarray(np.concatenate(
            [m, spec_local + spec_pos(t)[None, :]]))

    colors, depths, mem_p, mem_s = [], [], [], []
    for t in range(num_frames):
        m_t = means_at(t)
        out = render(m_t, all_quats, all_ls, all_op, all_sh, gt_w2c[t],
                     cam, impl=impl, max_instances=max_instances)
        colors.append(jnp.clip(out["render"], 0.0, 1.0))
        depths.append(out["render_dep"])
        memb = render(m_t, all_quats, all_ls, all_op, ind_sh, gt_w2c[t],
                      cam, impl=impl, max_instances=max_instances,
                      bg=jnp.zeros(3))["render"]
        mem_p.append(jnp.clip(memb[0], 0.0, 1.0))
        mem_s.append(jnp.clip(memb[1], 0.0, 1.0))
    colors = jnp.stack(colors)
    depths = jnp.stack(depths)
    mem_p = jnp.stack(mem_p)
    mem_s = jnp.stack(mem_s)

    dmin = depths.min(axis=(1, 2), keepdims=True)
    dmax = depths.max(axis=(1, 2), keepdims=True)
    monodeps = (depths - dmin) / jnp.maximum(dmax - dmin, 1e-8) + 0.5

    # analytic flow with scene motion: displace each pixel's
    # back-projection by membership-weighted world displacement
    xg, yg = pixel_grid(cam.height, cam.width)
    pix = jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)
    flows = []
    for t in range(num_frames - 1):
        pts = backproject(depths[t], cam, invert_se3(gt_w2c[t]))
        dp = jnp.asarray(patch_disp(t + 1) - patch_disp(t))
        ds = jnp.asarray(spec_vel)
        pts1 = (pts + mem_p[t].reshape(-1, 1) * dp[None, :]
                + mem_s[t].reshape(-1, 1) * ds[None, :])
        proj, _ = project(transform_points(gt_w2c[t + 1], pts1), cam)
        flows.append((proj - pix).T.reshape(2, cam.height, cam.width))
    flows = jnp.stack(flows)

    scene = SyntheticScene(cam=cam, means=means_at(0), quats=all_quats,
                           log_scales=all_ls, logit_opacity=all_op,
                           sh=all_sh, gt_w2c=gt_w2c, gt_quats=gt_q,
                           gt_trans=gt_t, colors=colors, depths=depths,
                           monodeps=monodeps, flows_fw=flows)
    aux = {"member_patch": mem_p, "member_spec": mem_s,
           "nonrigid_mask": (mem_p + mem_s) > 0.3}
    return scene, aux
