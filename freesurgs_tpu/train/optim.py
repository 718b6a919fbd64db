"""Hand-rolled Adam with per-leaf learning rates + state surgery hooks.

Why not optax.adam directly: densification must edit optimizer moments
per-slot under jit (zero the moments of newly created Gaussians, exactly
like the reference's ``cat_tensors_to_optimizer`` /
``replace_tensor_to_optimizer`` Adam-state surgery,
``scene/gaussian_model.py:501-596``). A transparent two-moment pytree makes
that a masked scatter instead of an optimizer-internals excavation.

Semantics match torch.optim.Adam (the reference's optimizer): one shared
step count per optimizer, bias correction via 1 - beta^t, update
lr * m_hat / (sqrt(v_hat) + eps) with eps=1e-15
(``scene/gaussian_model.py:405``, ``scene/pose_optimizer.py:489-496``).
Learning rates are passed per update call as a pytree matching the params
(so schedules are plain jnp functions of the step, usable inside jit/scan).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class AdamState(struct.PyTreeNode):
    mu: Any          # first moments, same pytree as params
    nu: Any          # second moments
    count: jnp.ndarray  # () int32 shared step count (torch per-group step)


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, lrs, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-15):
    """Returns (updates_to_ADD_to_params, new_state).

    lrs: pytree of scalars matching params structure (or a single scalar).
    """
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                      state.nu, grads)
    if not isinstance(lrs, (dict, list, tuple)):
        lrs = jax.tree.map(lambda _: lrs, mu)

    def upd(lr, m, v):
        return -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    updates = jax.tree.map(upd, lrs, mu, nu)
    return updates, AdamState(mu=mu, nu=nu, count=count)


def apply_updates(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def surgery_mask_moments(state: AdamState, mask, leaf_axis0: bool = True
                         ) -> AdamState:
    """Zero the Adam moments of slots where ``mask`` is True.

    mask: (C,) bool over the leading (slot) axis of every leaf. This is the
    jit-friendly analogue of the reference's cat-zeros / prune-slice
    optimizer surgery.
    """
    def zero(x):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return state.replace(mu=jax.tree.map(zero, state.mu),
                         nu=jax.tree.map(zero, state.nu))


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linear LR decay, jnp version of the reference's
    ``get_expon_lr_func`` (``utils/general_utils.py:155-188``)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t)
                       + jnp.log(lr_final) * t)
    return delay * log_lerp


def tracking_lr(iter_idx, total_iters: int, base_lr: float = 0.01,
                gamma: float = 0.5):
    """Step-decayed tracking LR: halved at 0, 1/3 and 2/3 of the budget.

    Mirrors the reference's MultiStepLR(milestones=range(0, it, it//3),
    gamma=0.5) applied before each optimizer step
    (``scene/pose_optimizer.py:494-496``): effective lr starts at
    base*gamma (milestone 0 fires immediately) and halves twice more.
    """
    third = max(total_iters // 3, 1)
    n_hits = 1 + jnp.minimum(jnp.asarray(iter_idx) // third, 2)
    return base_lr * gamma ** n_hits.astype(jnp.float32)
