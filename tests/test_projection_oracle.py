import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import build_w2c, transform_points
from freesurgs_tpu.ops.projection import TILE, project_gaussians
from freesurgs_tpu.ops.oracle import rasterize_oracle

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def _gauss(rng, n, z_range=(0.5, 3.0)):
    means = np.stack([
        rng.uniform(-0.4, 0.4, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(*z_range, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.0, -2.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    return jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats)


def test_projection_center_pixel():
    means = jnp.asarray([[0.0, 0.0, 1.0]])
    scales = jnp.full((1, 3), 0.05)
    quats = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    proj = project_gaussians(means, scales, quats, CAM)
    # fx*0/1 + cx - 0.5 = 31.5
    np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [31.5, 23.5],
                               atol=1e-5)
    assert int(proj.radius[0]) > 0
    np.testing.assert_allclose(float(proj.depth[0]), 1.0)


def test_projection_cov2d_isotropic_analytic():
    """Isotropic gaussian on axis: cov2d = (f*s/z)^2 I + 0.3 I."""
    s = 0.02
    z = 2.0
    proj = project_gaussians(
        jnp.asarray([[0.0, 0.0, z]]), jnp.full((1, 3), s),
        jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), CAM)
    var = (CAM.fx * s / z) ** 2 + 0.3
    conic = np.asarray(proj.conic[0])
    np.testing.assert_allclose(conic, [1 / var, 0.0, 1 / var], rtol=1e-5)


def test_projection_near_cull():
    means = jnp.asarray([[0.0, 0.0, 0.1], [0.0, 0.0, 1.0]])
    proj = project_gaussians(means, jnp.full((2, 3), 0.05),
                             jnp.asarray([[1.0, 0, 0, 0]] * 2), CAM)
    assert int(proj.radius[0]) == 0  # z=0.1 <= 0.2 culled
    assert int(proj.radius[1]) > 0
    assert int(proj.tiles_touched[0]) == 0


def test_projection_active_mask(rng):
    means, scales, quats = _gauss(rng, 10)
    active = jnp.asarray([True] * 5 + [False] * 5)
    proj = project_gaussians(means, scales, quats, CAM, active=active)
    assert np.all(np.asarray(proj.radius[5:]) == 0)


def test_oracle_single_opaque_gaussian():
    means = jnp.asarray([[0.0, 0.0, 1.0]])
    proj = project_gaussians(means, jnp.full((1, 3), 0.5),
                             jnp.asarray([[1.0, 0, 0, 0]]), CAM)
    colors = jnp.asarray([[0.2, 0.4, 0.6]])
    out = rasterize_oracle(proj, colors, jnp.asarray([1.0]),
                           CAM.height, CAM.width, jnp.zeros(3))
    img = np.asarray(out["image"])
    # center pixel: alpha = min(0.99, exp(~0)) = 0.99 -> color * 0.99
    cy, cx = 23, 31
    np.testing.assert_allclose(img[:, cy, cx], 0.99 * np.asarray(colors[0]),
                               rtol=1e-3)
    # far corner outside radius: background (0)
    assert img[:, 0, 0].max() < 0.99


def test_oracle_white_background():
    proj = project_gaussians(jnp.asarray([[0.0, 0.0, 1.0]]),
                             jnp.full((1, 3), 0.001),
                             jnp.asarray([[1.0, 0, 0, 0]]), CAM)
    out = rasterize_oracle(proj, jnp.asarray([[0.0, 0.0, 0.0]]),
                           jnp.asarray([0.0]), CAM.height, CAM.width,
                           jnp.ones(3))
    img = np.asarray(out["image"])
    np.testing.assert_allclose(img, 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0, atol=1e-6)


def test_oracle_depth_ordering():
    """A nearer opaque gaussian must occlude a farther one."""
    means = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]])  # far first
    proj = project_gaussians(means, jnp.full((2, 3), 0.5),
                             jnp.asarray([[1.0, 0, 0, 0]] * 2), CAM)
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = rasterize_oracle(proj, colors, jnp.asarray([1.0, 1.0]),
                           CAM.height, CAM.width, jnp.zeros(3))
    img = np.asarray(out["image"])
    cy, cx = 23, 31
    assert img[1, cy, cx] > 0.95  # near green dominates
    assert img[0, cy, cx] < 0.05


def test_oracle_transmittance_stop():
    """Stack of many gaussians: T must never drop below 1e-4 and the sum of
    weights + T_final must equal 1 with zero bg leftover."""
    n = 40
    means = jnp.asarray([[0.0, 0.0, 1.0 + 0.01 * i] for i in range(n)])
    proj = project_gaussians(means, jnp.full((n, 3), 0.5),
                             jnp.asarray([[1.0, 0, 0, 0]] * n), CAM)
    out = rasterize_oracle(proj, jnp.ones((n, 1)), jnp.full((n,), 0.9),
                           CAM.height, CAM.width, jnp.zeros(1))
    T = np.asarray(out["final_T"])
    img = np.asarray(out["image"][0])
    np.testing.assert_allclose(img + T, 1.0, atol=1e-5)


def test_oracle_gradients_to_pose(rng):
    """End-to-end: d(loss)/d(pose) through transform -> projection -> raster."""
    means_w, scales, quats = _gauss(rng, 30)
    colors = jnp.asarray(rng.uniform(size=(30, 3)).astype(np.float32))
    opac = jnp.full((30,), 0.8)

    def render_loss(q, t):
        w2c = build_w2c(q, t)
        mc = transform_points(w2c, means_w)
        proj = project_gaussians(mc, scales, quats, CAM)
        out = rasterize_oracle(proj, colors, opac, CAM.height, CAM.width,
                               jnp.ones(3))
        return jnp.mean(out["image"] ** 2)

    q0 = jnp.asarray([1.0, 0.02, -0.01, 0.03])
    t0 = jnp.asarray([0.01, -0.02, 0.05])
    gq, gt = jax.grad(render_loss, argnums=(0, 1))(q0, t0)
    assert np.all(np.isfinite(np.asarray(gq)))
    assert np.linalg.norm(np.asarray(gt)) > 0
    # finite differences on translation (smooth path dominates)
    eps = 1e-3
    for i in range(3):
        fd = (render_loss(q0, t0.at[i].add(eps))
              - render_loss(q0, t0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gt)[i], fd, rtol=5e-2,
                                   atol=1e-4)


def test_oracle_gradients_gaussian_params(rng):
    means_w, scales, quats = _gauss(rng, 10)
    colors = jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32))

    def loss(means, log_scales, opac_logit, cols):
        proj = project_gaussians(means, jnp.exp(log_scales), quats, CAM)
        out = rasterize_oracle(proj, cols, jax.nn.sigmoid(opac_logit),
                               CAM.height, CAM.width, jnp.ones(3))
        return jnp.mean((out["image"] - 0.5) ** 2)

    args = (means_w, jnp.log(scales), jnp.zeros(10), colors)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for g, a in zip(grads, args):
        assert g.shape == a.shape
        assert np.all(np.isfinite(np.asarray(g)))
    # finite diff spot-check: opacity logit of gaussian 0
    eps = 1e-3
    fd = (loss(args[0], args[1], args[2].at[0].add(eps), args[3])
          - loss(args[0], args[1], args[2].at[0].add(-eps), args[3])) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grads[2])[0], fd, rtol=5e-2,
                               atol=1e-6)


def test_tile_constant():
    assert TILE == 16
