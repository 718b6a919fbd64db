"""Densification and pruning at fixed capacity, fully under jit.

The reference reallocates tensors and performs Adam-state surgery on every
densify event (``densify_and_clone`` / ``densify_and_split`` /
``densify_and_prune`` + ``cat_tensors_to_optimizer``,
``scene/gaussian_model.py:501-676``). On TPU reallocation means
recompilation, so the TPU-native design keeps a fixed-capacity slot pool
(see ``models/gaussians.py``) and expresses the same semantics as masked
scatters:

- clone:  grad >= thresh and max_scale <= 0.01 * scene_radius
          -> copy into a free slot (original kept)
- split:  grad >= thresh and max_scale >  0.01 * scene_radius
          -> two children sampled from N(0, scale) rotated into world frame,
             child scale = scale / (0.8 * 2); original pruned
- prune:  opacity < min_opacity, or (size gate on) world scale >
          0.1 * scene_radius; the reference's radii2D screen prune is
          dead code there (see DensifyConfig.prune_radii2d) and off here
- moments of created slots are zeroed (the reference cats zeros into
  exp_avg / exp_avg_sq); moments of pruned slots are cleared.

If more children are requested than free slots exist, the extras are
dropped and counted (the host grows capacity on sustained overflow).
Randomness comes from a jax PRNG key (the reference uses torch.normal).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.transforms import quat_to_rotmat
from ..models.gaussians import GaussianField, inverse_sigmoid
from .optim import AdamState, surgery_mask_moments


class DensifyConfig(NamedTuple):
    grad_threshold: float = 2e-4      # opt.densify_grad_threshold
    min_opacity: float = 0.05         # train.py:309
    percent_dense: float = 0.01       # split/clone scale pivot
    prune_scale_frac: float = 0.1     # world-size prune
    split_factor: float = 1.6         # new scale = scale / (0.8 * N), N=2
    # The reference's screen-size prune (max_radii2D > 20,
    # scene/gaussian_model.py:671-673) is DEAD CODE in the reference:
    # densify_and_clone / densify_and_split both call
    # densification_postfix, which zeroes max_radii2D
    # (scene/gaussian_model.py:617) BEFORE the prune mask is computed, so
    # big_points_vs is always all-False. Round 3 implemented the literal
    # (accumulated-radii) reading and it over-pruned catastrophically at
    # full resolution (active count 131k -> 59k during global refinement,
    # PSNR capped at 18.6: any gaussian whose screen radius exceeded
    # 20 px in the preceding 300-iteration window died every event after
    # iteration 4000). Default False == the reference's effective
    # semantics; True keeps the literal reading for experiments.
    prune_radii2d: bool = False
    max_screen_size: float = 20.0     # radii2D prune threshold (if enabled)


class DensifyStats(NamedTuple):
    cloned: jnp.ndarray
    split: jnp.ndarray
    pruned: jnp.ndarray
    pruned_opacity: jnp.ndarray   # per-cause attribution (prune_m is the
    pruned_world: jnp.ndarray     # union; causes can overlap)
    pruned_screen: jnp.ndarray
    dropped: jnp.ndarray   # children that didn't fit in free slots
    num_active: jnp.ndarray


def _scatter_rows(x: jnp.ndarray, dest: jnp.ndarray, src_rows: jnp.ndarray):
    """x[dest[i]] = src_rows[i] for dest[i] < C (mode=drop)."""
    return x.at[dest].set(src_rows, mode="drop")


def densify_and_prune(field: GaussianField, opt_state: AdamState,
                      key: jax.Array, cfg: DensifyConfig,
                      use_screen_size) -> tuple[GaussianField, AdamState,
                                                DensifyStats]:
    """One densify+prune event. ``use_screen_size`` is a traced bool
    (reference: size threshold only active after iteration 4000)."""
    c = field.capacity
    act = field.active
    grads = jnp.where(field.grad_denom > 0,
                      field.grad_accum / jnp.maximum(field.grad_denom, 1.0),
                      0.0)
    scales = jnp.exp(field.log_scales)
    max_scale = jnp.max(scales, axis=1)
    opacity = jax.nn.sigmoid(field.logit_opacity)
    pivot = cfg.percent_dense * field.scene_radius

    hot = act & (grads >= cfg.grad_threshold)
    clone_m = hot & (max_scale <= pivot)
    split_m = hot & (max_scale > pivot)

    # Prune causes, matching the reference's EFFECTIVE semantics
    # (scene/gaussian_model.py:669-674): opacity < min_opacity always;
    # world-size (scale > 0.1 * scene_radius) only when the size gate is
    # on (iteration > 4000, train.py:305-311). The radii2D prune is dead
    # in the reference (see DensifyConfig.prune_radii2d) — off by default.
    size_gate = jnp.asarray(use_screen_size, bool)
    prune_op = act & (opacity < cfg.min_opacity)
    prune_world = act & (max_scale > cfg.prune_scale_frac
                         * field.scene_radius) & size_gate
    prune_screen = (act & (field.max_radii2d > cfg.max_screen_size)
                    & size_gate) if cfg.prune_radii2d else \
        jnp.zeros_like(prune_op)
    prune_m = prune_op | prune_world | prune_screen
    prune_m = prune_m | split_m   # split originals die

    # ---- children bookkeeping: clones (1 child) + splits (2 children).
    # Work over a 3C-wide virtual child list: [clone | split0 | split1].
    free = ~act | prune_m
    want3 = jnp.concatenate([clone_m, split_m, split_m])
    free3 = jnp.concatenate([free, jnp.zeros((2 * c,), bool)])
    # rank children jointly against the C free slots
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    free_slots = jnp.full((c,), c, jnp.int32).at[
        jnp.where(free, free_rank, c)].set(jnp.arange(c, dtype=jnp.int32),
                                           mode="drop")
    want_rank = jnp.cumsum(want3.astype(jnp.int32)) - 1
    n_free = jnp.sum(free)
    placed3 = want3 & (want_rank < n_free)
    dest3 = jnp.where(placed3,
                      free_slots[jnp.clip(want_rank, 0, c - 1)], c)

    src3 = jnp.tile(jnp.arange(c, dtype=jnp.int32), 3)

    # child parameter values
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (2, c, 3)) * scales[None]
    R = quat_to_rotmat(field.quats)                       # (C, 3, 3)
    offs = jnp.einsum("cij,kcj->kci", R, noise)           # (2, C, 3)
    child_means = jnp.concatenate(
        [field.means, field.means + offs[0], field.means + offs[1]])
    split_log_scales = field.log_scales - jnp.log(0.8 * 2.0)
    child_log_scales = jnp.concatenate(
        [field.log_scales, split_log_scales, split_log_scales])

    def place(x, child_vals=None):
        vals = x[src3 % c] if child_vals is None else child_vals
        return _scatter_rows(x, dest3, vals)

    new_params = {
        "means": place(field.means, child_means),
        "quats": place(field.quats),
        "log_scales": place(field.log_scales, child_log_scales),
        "logit_opacity": place(field.logit_opacity),
        "sh_dc": place(field.sh_dc),
        "sh_rest": place(field.sh_rest),
    }
    new_active = (act & ~prune_m).at[dest3].set(placed3, mode="drop")

    field = field.replace(active=new_active, **new_params)
    # densification stats reset after every event (reference
    # densification_postfix zeroes accum/denom/max_radii2D)
    field = field.reset_stats()

    # ---- optimizer moment surgery: created + pruned slots -> zero moments.
    created = jnp.zeros((c,), bool).at[dest3].set(placed3, mode="drop")
    opt_state = surgery_mask_moments(opt_state, created | prune_m)

    stats = DensifyStats(
        cloned=jnp.sum(clone_m), split=jnp.sum(split_m),
        pruned=jnp.sum(prune_m & ~split_m),
        pruned_opacity=jnp.sum(prune_op),
        pruned_world=jnp.sum(prune_world),
        pruned_screen=jnp.sum(prune_screen),
        dropped=jnp.sum(want3) - jnp.sum(placed3),
        num_active=jnp.sum(new_active))
    return field, opt_state, stats


def reset_opacity(field: GaussianField, opt_state: AdamState,
                  ceiling: float = 0.01) -> tuple[GaussianField, AdamState]:
    """Clamp opacities to <= ceiling and zero the opacity Adam moments
    (reference ``reset_opacity`` + ``replace_tensor_to_optimizer``,
    ``scene/gaussian_model.py:452-456, 501-521``)."""
    op = jax.nn.sigmoid(field.logit_opacity)
    new_logit = inverse_sigmoid(jnp.minimum(op, ceiling))
    field = field.replace(logit_opacity=jnp.where(field.active, new_logit,
                                                  field.logit_opacity))
    mu = dict(opt_state.mu)
    nu = dict(opt_state.nu)
    mu["logit_opacity"] = jnp.zeros_like(mu["logit_opacity"])
    nu["logit_opacity"] = jnp.zeros_like(nu["logit_opacity"])
    return field, opt_state.replace(mu=mu, nu=nu)


def add_render_stats(field: GaussianField, probe_grad: jnp.ndarray,
                     radii: jnp.ndarray, visibility: jnp.ndarray,
                     grad_scale: jnp.ndarray | None = None
                     ) -> GaussianField:
    """Accumulate per-view densification statistics (reference
    ``add_densification_stats`` + max_radii2D update,
    ``scene/gaussian_model.py:678-681``, ``train.py:299-303``).

    ``grad_scale``: per-axis scale applied to the screen-space gradient
    before the norm. The reference's CUDA backward emits ``dL_dmean2D`` in
    HALF-NDC units — the pixel-space gradient times (0.5*W, 0.5*H)
    (upstream ``backward.cu`` renderCUDA: ``ddelx_dx = 0.5 * W``) — and
    ``densify_grad_threshold = 2e-4`` is calibrated against THOSE units.
    Our probe cotangent is in pixels, so callers must pass
    (0.5*W, 0.5*H); comparing raw pixel gradients against 2e-4
    under-densifies by ~W/2 (640x at SCARED full res).
    """
    vis = visibility & field.active
    if grad_scale is not None:
        probe_grad = probe_grad * grad_scale
    gnorm = jnp.linalg.norm(probe_grad, axis=-1)
    return field.replace(
        grad_accum=field.grad_accum + jnp.where(vis, gnorm, 0.0),
        grad_denom=field.grad_denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis,
                              jnp.maximum(field.max_radii2d,
                                          radii.astype(jnp.float32)),
                              field.max_radii2d))
