"""Parity: Pallas tile rasterizer (interpret mode on CPU) vs the jnp oracle.

This is the BASELINE config-1 gate: pixel values AND pixel gradients must
match between the two implementations (which share compositing algebra but
completely different execution: dense vs tile-binned chunked kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesurgs_tpu.core.camera import Camera
from freesurgs_tpu.core.transforms import build_w2c, transform_points
from freesurgs_tpu.ops.render import render

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def make_scene(rng, n, sh_k=1):
    means = np.stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.4, n),
        rng.uniform(0.6, 3.0, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = rng.uniform(-4.0, -2.0, (n, 3)).astype(np.float32)
    logit_op = rng.uniform(-1.0, 3.0, n).astype(np.float32)
    sh = rng.normal(size=(n, sh_k, 3)).astype(np.float32) * 0.3
    return (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(log_scales),
            jnp.asarray(logit_op), jnp.asarray(sh))


def both(args, w2c, bin_tile=32, **kw):
    a = render(*args, w2c, CAM, impl="oracle", **kw)
    b = render(*args, w2c, CAM, impl="pallas_interpret",
               max_instances=4096, bin_tile=bin_tile, **kw)
    return a, b


@pytest.mark.parametrize("bin_tile", [16, 32])
def test_forward_parity(rng, bin_tile):
    args = make_scene(rng, 200)
    w2c = jnp.eye(4)
    a, b = both(args, w2c, bin_tile=bin_tile)
    assert int(b["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(a["render"]),
                               np.asarray(b["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a["render_dep"]),
                               np.asarray(b["render_dep"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["render_sil"]),
                               np.asarray(b["render_sil"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a["final_T"]),
                               np.asarray(b["final_T"]), atol=2e-5)


def test_forward_parity_sh3(rng):
    args = make_scene(rng, 100, sh_k=16)
    w2c = jnp.eye(4)
    a = render(*args, w2c, CAM, impl="oracle", sh_degree=3)
    b = render(*args, w2c, CAM, impl="pallas_interpret", sh_degree=3,
               max_instances=4096)
    np.testing.assert_allclose(np.asarray(a["render"]),
                               np.asarray(b["render"]), atol=2e-5)


@pytest.mark.parametrize("bin_tile", [16, 32])
def test_gradient_parity(rng, bin_tile):
    """Pixel-gradient parity: grads of a random-weighted image sum w.r.t.
    every Gaussian parameter AND the camera pose must match."""
    args = make_scene(rng, 120)
    wimg = jnp.asarray(rng.normal(size=(3, CAM.height, CAM.width))
                       .astype(np.float32))
    wdep = jnp.asarray(rng.normal(size=(CAM.height, CAM.width))
                       .astype(np.float32))
    q0 = jnp.asarray([1.0, 0.01, -0.02, 0.005])
    t0 = jnp.asarray([0.01, -0.01, 0.02])

    def loss(means, quats, ls, lo, sh, q, t, impl):
        w2c = build_w2c(q, t)
        out = render(means, quats, ls, lo, sh, w2c, CAM, impl=impl,
                     max_instances=4096, bin_tile=bin_tile)
        return (jnp.sum(out["render"] * wimg)
                + jnp.sum(out["render_dep"] * wdep))

    ga = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        *args, q0, t0, "oracle")
    gb = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        *args, q0, t0, "pallas_interpret")
    names = ["means", "quats", "log_scales", "logit_op", "sh", "q", "t"]
    for name, a, b in zip(names, ga, gb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5,
                                   err_msg=f"grad mismatch: {name}")


def test_gradient_finite_difference(rng):
    """Pallas grads vs central finite differences on opacity + translation."""
    args = make_scene(rng, 40)
    t0 = jnp.asarray([0.0, 0.0, 0.0])

    def loss(lo, t):
        w2c = build_w2c(jnp.asarray([1.0, 0, 0, 0]), t)
        out = render(args[0], args[1], args[2], lo, args[4], w2c, CAM,
                     impl="pallas_interpret", max_instances=2048)
        return jnp.mean((out["render"] - 0.3) ** 2)

    glo, gt = jax.grad(loss, argnums=(0, 1))(args[3], t0)
    # Directional derivatives (better conditioned in f32 than per-coordinate)
    eps = 5e-3
    d = jnp.asarray(rng.normal(size=glo.shape).astype(np.float32))
    fd = (loss(args[3] + eps * d, t0) - loss(args[3] - eps * d, t0)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(glo, d)), float(fd), rtol=1e-1, atol=2e-5)
    dt = jnp.asarray(rng.normal(size=3).astype(np.float32))
    fd_t = (loss(args[3], t0 + eps * dt)
            - loss(args[3], t0 - eps * dt)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(gt, dt)), float(fd_t),
                               rtol=1e-1, atol=2e-5)


def test_overflow_counting(rng):
    args = make_scene(rng, 300)
    out = render(*args, jnp.eye(4), CAM, impl="pallas_interpret",
                 max_instances=128)
    assert int(out["overflow"]) > 0  # 300 gaussians can't fit in 128 slots


def test_probe2d_viewspace_gradient(rng):
    """The probe cotangent equals the screen-space gradient used for
    densification stats (reference means2D.grad)."""
    args = make_scene(rng, 50)
    probe = jnp.zeros((50, 2))

    def loss(p, impl):
        out = render(*args, jnp.eye(4), CAM, impl=impl, probe2d=p,
                     max_instances=2048)
        return jnp.mean(out["render"] ** 2)

    ga = np.asarray(jax.grad(loss)(probe, "oracle"))
    gb = np.asarray(jax.grad(loss)(probe, "pallas_interpret"))
    assert np.abs(ga).max() > 0
    scale = np.abs(ga).max()
    np.testing.assert_allclose(ga / scale, gb / scale, atol=5e-5)


def test_inactive_slots_excluded(rng):
    args = make_scene(rng, 60)
    active = jnp.asarray([True] * 30 + [False] * 30)
    out_all = render(*args, jnp.eye(4), CAM, impl="pallas_interpret",
                     active=active, max_instances=2048)
    args30 = tuple(a[:30] for a in args)
    out_30 = render(*args30, jnp.eye(4), CAM, impl="pallas_interpret",
                    max_instances=2048)
    np.testing.assert_allclose(np.asarray(out_all["render"]),
                               np.asarray(out_30["render"]), atol=2e-5)


@pytest.mark.parametrize("bin_tile", [16, 32])
def test_saturated_early_termination(rng, bin_tile):
    """Early-termination watermark (keff): a deck of near-opaque, frame-
    covering Gaussians saturates every pixel within the first chunks, so
    the forward stops composites early and the backward skips (and
    zero-fills) the never-composited tail. Values AND gradients must
    still match the oracle, which applies the per-pixel cutoff with no
    chunk-level break."""
    n = 600   # several CHUNKs deep on every tile
    means = np.stack([
        rng.uniform(-0.3, 0.3, n), rng.uniform(-0.25, 0.25, n),
        rng.uniform(0.6, 3.0, n)], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = rng.uniform(-1.5, -0.5, (n, 3)).astype(np.float32)
    logit_op = rng.uniform(2.5, 4.0, n).astype(np.float32)  # sigmoid>0.92
    sh = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3
    args = tuple(map(jnp.asarray, (means, quats, log_scales, logit_op, sh)))
    wimg = jnp.asarray(rng.normal(size=(3, CAM.height, CAM.width))
                       .astype(np.float32))

    def loss(means, lo, impl):
        out = render(means, args[1], args[2], lo, args[4], jnp.eye(4),
                     CAM, impl=impl, max_instances=16384,
                     bin_tile=bin_tile)
        return jnp.sum(out["render"] * wimg), out

    (la, outa), ga = jax.value_and_grad(loss, argnums=(0, 1),
                                        has_aux=True)(
        args[0], args[3], "oracle")
    (lb, outb), gb = jax.value_and_grad(loss, argnums=(0, 1),
                                        has_aux=True)(
        args[0], args[3], "pallas_interpret")
    assert int(outb["overflow"]) == 0
    # saturation really happened: the median pixel sits at the T_EPS
    # cutoff floor (the loop stops just before crossing 1e-4)
    assert float(jnp.median(outa["final_T"])) < 1e-3
    np.testing.assert_allclose(np.asarray(outa["render"]),
                               np.asarray(outb["render"]), atol=2e-5)
    for name, a, b in zip(("means", "logit_op"), ga, gb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5,
                                   err_msg=f"grad mismatch: {name}")


@pytest.mark.parametrize("hw", [(33, 47), (16, 16)])
def test_nonmultiple_tile_sizes(rng, hw):
    h, w = hw
    cam = Camera(height=h, width=w, fx=40.0, fy=40.0, cx=w / 2, cy=h / 2)
    args = make_scene(rng, 64)
    a = render(*args, jnp.eye(4), cam, impl="oracle")
    b = render(*args, jnp.eye(4), cam, impl="pallas_interpret",
               max_instances=2048)
    np.testing.assert_allclose(np.asarray(a["render"]),
                               np.asarray(b["render"]), atol=2e-5)
