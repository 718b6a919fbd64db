"""Finite-difference gradient checks through the FULL composite, plus a
one-place audit of every CUDA-parity constant (VERDICT round-1 item 7).

The reference's gradient contract is upstream diff-gaussian-rasterization's
hand-written backward.cu; round 1 only asserted oracle == pallas agreement
(both self-authored). These tests anchor the gradients to the mathematics
itself: central finite differences of the scalar loss through projection +
binning + compositing must match jax.grad for ALL six Gaussian parameter
groups AND the camera pose, at fp32 tolerances.

The compositing cutoffs (power <= 0, alpha >= 1/255, T < 1e-4 stop) are
hard boundaries that both CUDA and this implementation treat as
non-differentiable — FD across them measures the jump, not the gradient.
The scene is therefore constructed so NO cutoff binds anywhere in the
image: every Gaussian's footprint covers the whole 16x16 frame with
alpha >= ~6x ALPHA_MIN at the far corner (sigma_px >= 6, means near the
center), opacities <= 0.6 keep the worst-case transmittance ~6x above
T_EPS, and nothing approaches the 0.99 clamp or the EWA 1.3*tan(fov)
clip. Inside that region the composite is C^infinity and central
differences must agree with jax.grad to fp32 accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import build_w2c
from freesurgs_tpu.ops.render import render

CAM = Camera(height=16, width=16, fx=18.0, fy=18.0, cx=8.0, cy=8.0)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    n = 8
    means = np.stack([
        rng.uniform(-0.15, 0.15, n), rng.uniform(-0.15, 0.15, n),
        rng.uniform(0.9, 1.2, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = rng.uniform(-0.9, -0.6, (n, 3)).astype(np.float32)
    logit_op = rng.uniform(-0.6, 0.4, n).astype(np.float32)
    sh = (rng.normal(size=(n, 4, 3)) * 0.3).astype(np.float32)
    q = np.asarray([0.998, 0.02, -0.03, 0.04], np.float32)
    t = np.asarray([0.01, -0.02, 0.015], np.float32)
    wimg = rng.normal(size=(3, 16, 16)).astype(np.float32)
    wdep = rng.normal(size=(16, 16)).astype(np.float32)
    return [jnp.asarray(a) for a in
            (means, quats, log_scales, logit_op, sh, q, t, wimg, wdep)]


def _loss_fn(wimg, wdep):
    def loss(means, quats, ls, lo, sh, q, t):
        w2c = build_w2c(q, t)
        out = render(means, quats, ls, lo, sh, w2c, CAM, impl="oracle",
                     sh_degree=1)
        return (jnp.sum(out["render"] * wimg)
                + jnp.sum(out["render_dep"] * wdep))
    return loss


NAMES = ["means", "quats", "log_scales", "logit_opacity", "sh",
         "pose_q", "pose_t"]


@pytest.mark.parametrize("argnum", range(7))
def test_fd_gradient(scene, argnum):
    """Central-difference DIRECTIONAL derivatives vs jax.grad.

    Per-coordinate fp32 FD drowns in summation rounding for the many
    small-gradient coordinates (noise ~1e-5/eps); directional derivatives
    along (a) the gradient direction and (b) fixed random directions
    aggregate the whole cotangent into one well-conditioned number each.
    """
    *params, wimg, wdep = scene
    loss = jax.jit(_loss_fn(wimg, wdep))
    g = np.asarray(jax.grad(loss, argnums=argnum)(*params),
                   dtype=np.float64)
    gnorm = np.linalg.norm(g)
    assert gnorm > 1e-4, f"degenerate gradient for {NAMES[argnum]}"

    x = np.asarray(params[argnum], np.float64)
    rng = np.random.default_rng(100 + argnum)
    dirs = [g / gnorm]
    for _ in range(3):
        v = rng.normal(size=g.shape)
        dirs.append(v / np.linalg.norm(v))

    # No single eps conditions every direction: central-difference
    # truncation grows O(eps^2) (position-like params have large third
    # derivatives) while f32 loss-evaluation roundoff grows ~1e-6*|loss|/eps
    # (at 2e-3 it reached ~40% of the smallest directional projection).
    # A WRONG analytic gradient is a persistent offset that no eps matches,
    # so the sound check is: some eps in the sweet-spot range agrees.
    for k, v in enumerate(dirs):
        an = float(np.sum(g * v))
        # random directions can have near-zero projections; judge against
        # the gradient norm so the comparison stays meaningful
        scale = max(abs(an), 0.05 * gnorm)
        errs = []
        for eps_rel in (1e-3, 2e-3, 4e-3, 8e-3):
            eps = np.float64(max(eps_rel * np.abs(x).max(), eps_rel))
            args_p = list(params)
            args_m = list(params)
            args_p[argnum] = jnp.asarray((x + eps * v).astype(np.float32))
            args_m[argnum] = jnp.asarray((x - eps * v).astype(np.float32))
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            errs.append(abs(an - fd) / scale)
        assert min(errs) < 0.04, (
            f"{NAMES[argnum]} dir {k}: analytic {an:.6g}, FD rel errs "
            f"{[round(e, 4) for e in errs]} (|g| {gnorm:.4g})")


def test_cuda_parity_constants_audit():
    """Every CUDA-parity constant, asserted in one place with upstream
    citations (diff-gaussian-rasterization @ depth fork pinned in the
    reference's requirements.txt; semantics in cuda_rasterizer/forward.cu
    and auxiliary.h).
    """
    from freesurgs_tpu.ops import oracle, projection

    # forward.cu: alpha = min(0.99f, con_o.w * exp(power)); skip if
    # alpha < 1.0f / 255.0f; stop when T * (1 - alpha) < 0.0001f
    assert oracle.ALPHA_MIN == 1.0 / 255.0
    assert oracle.ALPHA_MAX == 0.99
    assert oracle.T_EPS == 1e-4

    # forward.cu computeCov2D: cov[0][0] += 0.3f; cov[1][1] += 0.3f
    # (verify behaviorally: a zero 3D covariance projects to (0.3, 0, 0.3))
    mean_cam = jnp.asarray([[0.0, 0.0, 1.0]])
    cov3d = jnp.zeros((1, 3, 3))
    c2d = np.asarray(projection.ewa_cov2d(mean_cam, cov3d, CAM))
    np.testing.assert_allclose(c2d[0], [0.3, 0.0, 0.3], atol=1e-7)

    # auxiliary.h in_frustum: near cull at p_view.z <= 0.2
    # forward.cu: ndc2Pix(v, S) = ((v + 1) * S - 1) * 0.5 => f*x/z + c - 0.5
    n = 3
    means = jnp.asarray([[0.0, 0.0, 0.19],     # culled (z <= 0.2)
                         [0.0, 0.0, 0.21],     # kept
                         [0.1, -0.05, 1.0]])   # pixel-mapping check
    proj = projection.project_gaussians(
        means, jnp.full((n, 3), 0.01), jnp.tile(jnp.asarray([1., 0, 0, 0]),
                                                (n, 1)), CAM)
    r = np.asarray(proj.radius)
    assert r[0] == 0 and r[1] > 0
    np.testing.assert_allclose(
        np.asarray(proj.mean2d)[2],
        [CAM.fx * 0.1 / 1.0 + CAM.cx - 0.5,
         CAM.fy * -0.05 / 1.0 + CAM.cy - 0.5], rtol=1e-6)

    # computeCov2D clamps x/z to +/- 1.3 * tan(fov) before the Jacobian:
    # two points past the clamp limit must produce the same cov2d
    far1 = jnp.asarray([[10.0, 0.0, 1.0]])
    far2 = jnp.asarray([[20.0, 0.0, 1.0]])
    cov = jnp.eye(3)[None] * 1e-4
    c1 = np.asarray(projection.ewa_cov2d(far1, cov, CAM))
    c2 = np.asarray(projection.ewa_cov2d(far2, cov, CAM))
    np.testing.assert_allclose(c1, c2, rtol=1e-6)

    # forward.cu getRect / radius: ceil(3 * sigma) with lambda floor 0.1
    # => an isotropic on-axis gaussian with cov2d (s^2+0.3) has radius
    # ceil(3 * sqrt(s^2 + 0.3))
    s = 2.0
    mean_cam = jnp.asarray([[0.0, 0.0, 1.0]])
    scl = jnp.full((1, 3), s / CAM.fx)
    projc = projection.project_gaussians(
        mean_cam, scl, jnp.asarray([[1.0, 0, 0, 0]]), CAM)
    expect = int(np.ceil(3.0 * np.sqrt(s * s + 0.3)))
    assert int(np.asarray(projc.radius)[0]) == expect
