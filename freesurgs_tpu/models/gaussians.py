"""GaussianField: the learnable scene state as an immutable pytree.

TPU-native redesign of the reference's ``GaussianModel``
(``scene/gaussian_model.py``): instead of tensors whose length N changes at
every densify/prune (which would recompile every jitted function), the
field is a fixed-capacity slot pool:

- all arrays have leading dim ``capacity`` (static);
- ``active`` marks live slots; inactive slots are culled in projection and
  contribute nothing anywhere;
- densify/prune/clone/split happen *under jit* at constant shape by
  scattering into free slots (see ``train/densify.py``);
- the host only ever grows capacity (a rare re-pad + recompile event).

Parameterization matches the reference exactly:
  means (N, 3) | quats (N, 4) unnormalized | log_scales (N, 3)
  logit_opacity (N,) | sh_dc (N, 1, 3) | sh_rest (N, K-1, 3)
with activations exp / sigmoid / quat-normalize applied at render time
(``scene/gaussian_model.py:31-46``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core import sh as shlib
from ..core.camera import Camera, backproject
from ..core.transforms import invert_se3
from ..ops.knn import initial_log_scales


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianField(struct.PyTreeNode):
    # Learnable parameters (the optimizer touches exactly these six leaves,
    # mirroring the reference's params dict, scene/gaussian_model.py:53-60).
    means: jnp.ndarray
    quats: jnp.ndarray
    log_scales: jnp.ndarray
    logit_opacity: jnp.ndarray
    sh_dc: jnp.ndarray
    sh_rest: jnp.ndarray
    # Slot bookkeeping + densification statistics (reference `variables`).
    active: jnp.ndarray          # (C,) bool
    max_radii2d: jnp.ndarray     # (C,) f32
    grad_accum: jnp.ndarray      # (C,) f32  — sum of ||dL/d mean2d||
    grad_denom: jnp.ndarray      # (C,) f32
    scene_radius: jnp.ndarray    # ()  f32
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ------------------------------------------------------------ views
    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active)

    @property
    def sh(self) -> jnp.ndarray:
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)

    def param_dict(self) -> dict[str, jnp.ndarray]:
        """The six optimizer-visible leaves (per-group LRs key off these
        names, mirroring scene/gaussian_model.py:387-403)."""
        return {
            "means": self.means,
            "quats": self.quats,
            "log_scales": self.log_scales,
            "logit_opacity": self.logit_opacity,
            "sh_dc": self.sh_dc,
            "sh_rest": self.sh_rest,
        }

    def with_params(self, p: dict[str, jnp.ndarray]) -> "GaussianField":
        return self.replace(**p)

    def reset_stats(self) -> "GaussianField":
        return self.replace(
            max_radii2d=jnp.zeros_like(self.max_radii2d),
            grad_accum=jnp.zeros_like(self.grad_accum),
            grad_denom=jnp.zeros_like(self.grad_denom))


def _round_capacity(n: int, quantum: int = 4096) -> int:
    return max(-(-n // quantum) * quantum, quantum)


def from_pointcloud(points: jnp.ndarray, colors: jnp.ndarray,
                    scene_radius, max_sh_degree: int = 3,
                    capacity: int | None = None,
                    init_opacity: float = 0.1) -> GaussianField:
    """Initialize from an (N, 3) + (N, 3 rgb) point cloud.

    Mirrors ``initialize_first_params`` (``scene/gaussian_model.py:335-369``):
    quats (1,0,0,0), opacity logit(0.1), scales from 3-NN mean squared
    distance, SH DC from RGB2SH, rest zero.
    """
    n = points.shape[0]
    cap = capacity or _round_capacity(int(1.5 * n))
    k = shlib.num_sh_coeffs(max_sh_degree)

    log_s = initial_log_scales(points)

    def pad(x, fill=0.0):
        shape = (cap,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[:n].set(x)

    quats = jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0)
    return GaussianField(
        means=pad(points.astype(jnp.float32)),
        quats=quats,
        log_scales=pad(log_s),
        logit_opacity=jnp.full((cap,), float(inverse_sigmoid(
            jnp.asarray(init_opacity)))).at[:].get() * 0
        + pad(jnp.full((n,), float(inverse_sigmoid(
            jnp.asarray(init_opacity))))),
        sh_dc=pad(shlib.rgb2sh(colors.astype(jnp.float32))[:, None, :]),
        sh_rest=jnp.zeros((cap, k - 1, 3), jnp.float32),
        active=jnp.zeros((cap,), bool).at[:n].set(True),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        grad_accum=jnp.zeros((cap,), jnp.float32),
        grad_denom=jnp.zeros((cap,), jnp.float32),
        scene_radius=jnp.asarray(scene_radius, jnp.float32),
        max_sh_degree=max_sh_degree,
    )


def from_rgbd(color: jnp.ndarray, depth: jnp.ndarray, cam: Camera,
              w2c: jnp.ndarray, mask: jnp.ndarray,
              max_sh_degree: int = 3,
              capacity: int | None = None) -> GaussianField:
    """First-frame initialization from a masked RGB-D back-projection.

    Mirrors ``initialize_first_timestep`` (``scene/gaussian_model.py:237-258``)
    + ``get_pointcloud`` (``utils/geometry_utils.py:276-331``):
    scene_radius = max(depth)/2, pixels subsampled by ``mask``.

    color: (3, H, W); depth: (H, W); mask: (H*W,) bool.
    NOTE: uses a boolean host-side mask -> non-jit (init-time only).
    """
    import numpy as np
    c2w = invert_se3(w2c)
    pts = backproject(depth, cam, c2w)
    cols = jnp.transpose(color, (1, 2, 0)).reshape(-1, 3)
    m = np.asarray(mask)
    pts = jnp.asarray(np.asarray(pts)[m])
    cols = jnp.asarray(np.asarray(cols)[m])
    scene_radius = jnp.max(depth) / 2.0
    return from_pointcloud(pts, cols, scene_radius, max_sh_degree, capacity)


def grow_capacity(field: GaussianField, new_capacity: int) -> GaussianField:
    """Re-pad every per-slot array to a larger capacity (host-side event)."""
    assert new_capacity >= field.capacity
    extra = new_capacity - field.capacity

    def pad(x):
        if x.ndim == 0:
            return x
        pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    per_slot = dict(field.param_dict())
    per_slot.update(active=field.active, max_radii2d=field.max_radii2d,
                    grad_accum=field.grad_accum,
                    grad_denom=field.grad_denom)
    padded = jax.tree.map(pad, per_slot)
    quats = padded["quats"].at[field.capacity:, 0].set(1.0)  # valid quats
    padded["quats"] = quats
    return field.replace(**padded)
