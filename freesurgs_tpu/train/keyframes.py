"""Keyframe selection by viewpoint overlap.

jnp port of ``PoseModel.keyframe_selection_overlap``
(``scene/pose_optimizer.py:534-577``): sample pixels with valid depth from
the current frame, back-project, reproject into each candidate keyframe,
score candidates by the fraction of points landing inside the (edge-20)
image bounds with positive depth, and randomly pick k among those with
positive overlap. The reference defines-but-never-calls this from
``train.py`` (which uses uniform random keyframes); both policies are
available to the trainer via ``TrainConfig``-level choice in the loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera, backproject, project
from ..core.transforms import invert_se3, transform_points


def keyframe_overlap_scores(cur_depth: jnp.ndarray, cur_w2c: jnp.ndarray,
                            kf_w2cs: jnp.ndarray, cam: Camera,
                            key: jax.Array, pixels: int = 1600,
                            edge: int = 20) -> jnp.ndarray:
    """Fraction of sampled current-frame points visible in each keyframe.

    cur_depth (H, W); kf_w2cs (K, 4, 4). Returns (K,) scores in [0, 1].
    """
    H, W = cam.height, cam.width
    flat_depth = cur_depth.reshape(-1)
    valid = flat_depth > 0
    # weighted sampling of valid pixels (reference samples uniformly among
    # valid indices; gumbel top-k over the validity mask is the
    # static-shape equivalent)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, logits.shape)
    idx = jax.lax.top_k(logits + g, pixels)[1]

    pts_w = backproject(cur_depth, cam, invert_se3(cur_w2c))[idx]

    def score(w2c):
        pc = transform_points(w2c, pts_w)
        proj, z = project(pc, cam)
        ok = ((proj[:, 0] > edge) & (proj[:, 0] < W - edge)
              & (proj[:, 1] > edge) & (proj[:, 1] < H - edge) & (z > 0))
        return jnp.mean(ok.astype(jnp.float32))

    return jax.vmap(score)(kf_w2cs)


def select_overlap_keyframes(scores: jnp.ndarray, key: jax.Array,
                             k: int) -> jnp.ndarray:
    """Random k among keyframes with positive overlap (reference shuffles
    the positive-overlap list and truncates). Returns (k,) indices into the
    scores array; if fewer than k have overlap, indices repeat."""
    pos = scores > 0
    g = jax.random.gumbel(key, scores.shape)
    ranked = jnp.argsort(jnp.where(pos, g, -jnp.inf))[::-1]
    n_pos = jnp.maximum(jnp.sum(pos), 1)
    take = jnp.minimum(jnp.arange(k), n_pos - 1)
    return ranked[take]
