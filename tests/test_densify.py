import jax
import jax.numpy as jnp
import numpy as np

from freesurgs_tpu.models import gaussians as gmod
from freesurgs_tpu.train import optim
from freesurgs_tpu.train.densify import (DensifyConfig, add_render_stats,
                                         densify_and_prune, reset_opacity)


def make_field(rng, n=20, cap=64, radius=2.0):
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    return gmod.from_pointcloud(pts, cols, radius, max_sh_degree=1,
                                capacity=cap)


def test_from_pointcloud_basics(rng):
    f = make_field(rng)
    assert f.capacity == 64
    assert int(f.num_active) == 20
    assert np.allclose(np.asarray(f.quats[:20, 0]), 1.0)
    op = jax.nn.sigmoid(f.logit_opacity[:20])
    np.testing.assert_allclose(np.asarray(op), 0.1, atol=1e-5)


def test_grow_capacity(rng):
    f = make_field(rng)
    g = gmod.grow_capacity(f, 128)
    assert g.capacity == 128
    assert int(g.num_active) == 20
    np.testing.assert_allclose(np.asarray(g.means[:64]),
                               np.asarray(f.means))


def _opt(f):
    return optim.adam_init(f.param_dict())


def test_clone_small_high_grad(rng):
    f = make_field(rng, n=10, cap=32)
    # small scales (clone branch), high grad on gaussians 0..4
    f = f.replace(log_scales=jnp.full_like(f.log_scales, -5.0),
                  grad_accum=f.grad_accum.at[:5].set(1.0),
                  grad_denom=f.grad_denom.at[:10].set(1.0))
    cfg = DensifyConfig()
    f2, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0), cfg,
                                  use_screen_size=False)
    assert int(st.cloned) == 5
    assert int(st.split) == 0
    assert int(f2.num_active) == 15
    # clones carry identical params
    new = np.asarray(f2.active) & ~np.asarray(f.active)
    cloned_means = np.asarray(f2.means)[new]
    orig = np.asarray(f.means)[:5]
    assert {tuple(np.round(r, 5)) for r in cloned_means} == \
        {tuple(np.round(r, 5)) for r in orig}


def test_split_large_high_grad(rng):
    f = make_field(rng, n=10, cap=64, radius=0.1)
    # large scales -> split branch
    f = f.replace(log_scales=jnp.full_like(f.log_scales, -2.0),
                  grad_accum=f.grad_accum.at[:3].set(1.0),
                  grad_denom=f.grad_denom.at[:10].set(1.0))
    f2, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                  DensifyConfig(), use_screen_size=False)
    assert int(st.split) == 3
    # 10 - 3 originals + 6 children
    assert int(f2.num_active) == 13
    # children scales shrunk by 1/1.6
    new = np.asarray(f2.active) & ~np.asarray(f.active)
    np.testing.assert_allclose(np.asarray(f2.log_scales)[new],
                               -2.0 - np.log(1.6), atol=1e-5)


def test_prune_low_opacity(rng):
    f = make_field(rng, n=10, cap=32)
    lo = f.logit_opacity.at[:4].set(gmod.inverse_sigmoid(jnp.asarray(0.01)))
    f = f.replace(logit_opacity=lo)
    f2, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                  DensifyConfig(), use_screen_size=False)
    assert int(st.pruned) == 4
    assert int(f2.num_active) == 6


def test_radii2d_prune_is_dead_by_default(rng):
    """Reference parity: the radii2D screen prune is dead code in the
    reference (densification_postfix zeroes max_radii2D before the prune
    mask is computed, scene/gaussian_model.py:617,671). A healthy gaussian
    with a huge accumulated screen radius must NOT be pruned — the literal
    reading collapsed the round-3 full run 131k -> 59k active."""
    f = make_field(rng, n=10, cap=32, radius=100.0)
    f = f.replace(max_radii2d=f.max_radii2d.at[:3].set(500.0))
    f_on, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                    DensifyConfig(), use_screen_size=True)
    assert int(f_on.num_active) == 10
    assert int(st.pruned_screen) == 0
    # the literal (accumulated-radii) reading stays available for
    # experiments behind prune_radii2d=True
    f_lit, _, st2 = densify_and_prune(
        f, _opt(f), jax.random.PRNGKey(0),
        DensifyConfig(prune_radii2d=True), use_screen_size=True)
    assert int(f_lit.num_active) == 7
    assert int(st2.pruned_screen) == 3


def test_world_size_prune_gated(rng):
    """The world-size prune (scale > 0.1 * scene_radius) IS live in the
    reference, gated by the size threshold (active after iter 4000)."""
    f = make_field(rng, n=10, cap=32, radius=1.0)
    f = f.replace(log_scales=jnp.full_like(f.log_scales, jnp.log(0.01)
                                           ).at[:3].set(jnp.log(0.5)))
    f_off, _, _ = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                    DensifyConfig(), use_screen_size=False)
    f_on, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                    DensifyConfig(), use_screen_size=True)
    assert int(f_off.num_active) == 10
    assert int(f_on.num_active) == 7
    assert int(st.pruned_world) == 3
    assert int(st.pruned_opacity) == 0


def test_repeated_events_do_not_collapse_healthy_field(rng):
    """Round-3 regression (VERDICT weak #1): many densify events over a
    field of healthy-opacity gaussians with full-res-scale screen radii
    must not shrink the active count. Would have failed on the round-3
    behavior (every gaussian with radii2D > 20 died each event)."""
    f = make_field(rng, n=40, cap=128)
    # healthy opacities (0.6), small world scales, big accumulated screen
    # radii (the full-res regime)
    f = f.replace(
        logit_opacity=jnp.full_like(f.logit_opacity,
                                    gmod.inverse_sigmoid(jnp.asarray(0.6))),
        log_scales=jnp.full_like(f.log_scales, jnp.log(0.01)),
        max_radii2d=jnp.where(f.active, 120.0, 0.0))
    opt = _opt(f)
    n0 = int(f.num_active)
    key = jax.random.PRNGKey(3)
    for i in range(10):
        key, k = jax.random.split(key)
        # re-accumulate radii each round, as renders would at full res
        f = f.replace(max_radii2d=jnp.where(f.active, 120.0, 0.0))
        f, opt, st = densify_and_prune(f, opt, k, DensifyConfig(),
                                       use_screen_size=True)
        assert int(st.pruned_screen) == 0
    assert int(f.num_active) >= n0


def test_overflow_drops_children(rng):
    f = make_field(rng, n=30, cap=32)
    f = f.replace(log_scales=jnp.full_like(f.log_scales, -5.0),
                  grad_accum=f.grad_accum.at[:30].set(1.0),
                  grad_denom=f.grad_denom.at[:30].set(1.0))
    f2, _, st = densify_and_prune(f, _opt(f), jax.random.PRNGKey(0),
                                  DensifyConfig(), use_screen_size=False)
    assert int(st.dropped) == 28  # 30 wanted, 2 free
    assert int(f2.num_active) == 32


def test_moment_surgery_on_created(rng):
    f = make_field(rng, n=10, cap=32)
    opt = _opt(f)
    upd, opt = optim.adam_update(
        jax.tree.map(jnp.ones_like, f.param_dict()), opt,
        jax.tree.map(lambda _: 1e-2, f.param_dict()))
    f = f.replace(log_scales=jnp.full_like(f.log_scales, -5.0),
                  grad_accum=f.grad_accum.at[:5].set(1.0),
                  grad_denom=f.grad_denom.at[:10].set(1.0))
    f2, opt2, _ = densify_and_prune(f, opt, jax.random.PRNGKey(0),
                                    DensifyConfig(), use_screen_size=False)
    created = np.asarray(f2.active) & ~np.asarray(f.active)
    mu = np.asarray(opt2.mu["means"])
    assert np.all(mu[created] == 0)
    survivors = np.asarray(f.active) & np.asarray(f2.active)
    assert np.all(mu[survivors] != 0)


def test_reset_opacity(rng):
    f = make_field(rng, n=10, cap=32)
    opt = _opt(f)
    f2, opt2 = reset_opacity(f, opt)
    op = np.asarray(jax.nn.sigmoid(f2.logit_opacity[:10]))
    assert np.all(op <= 0.0101)
    assert np.all(np.asarray(opt2.mu["logit_opacity"]) == 0)


def test_add_render_stats(rng):
    f = make_field(rng, n=10, cap=32)
    probe = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    radii = jnp.asarray((rng.uniform(1, 9, 32)).astype(np.int32))
    vis = jnp.zeros((32,), bool).at[:6].set(True)
    f2 = add_render_stats(f, probe, radii, vis)
    assert np.all(np.asarray(f2.grad_denom[:6]) == 1)
    assert np.all(np.asarray(f2.grad_denom[6:]) == 0)
    np.testing.assert_allclose(
        np.asarray(f2.grad_accum[:6]),
        np.linalg.norm(np.asarray(probe[:6]), axis=1), rtol=1e-5)


def test_densify_is_jittable(rng):
    f = make_field(rng, n=10, cap=32)
    opt = _opt(f)
    fn = jax.jit(lambda fi, o, k, u: densify_and_prune(
        fi, o, k, DensifyConfig(), u))
    f2, opt2, st = fn(f, opt, jax.random.PRNGKey(1), True)
    assert int(st.num_active) >= 0
