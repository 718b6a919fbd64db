"""Pose-only photometric refinement against a FROZEN map.

Eval protocol for SfM-free methods: test-frame poses are never optimized
by mapping (they come from tracking alone), so raw test-view PSNR mixes
map quality with pose error. Refining ONLY the test pose against the
frozen map (the map never sees the test frame's colors beyond this pose
fit) isolates the map's reconstruction quality — the protocol used by
pose-free baselines this framework targets (NoPe-NeRF-style test-time
pose alignment; the reference itself evaluates raw tracked poses,
``train.py:446-489``, which this module leaves as the default).

Differentiation happens through the renderer's world->camera transform
(``gs_grad=False, cam_grad=True``), the same pattern as tracking
(``train/steps.py:tracking_loop``) minus the flow/rigidity terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.transforms import build_w2c
from ..models.gaussians import GaussianField
from ..ops.render import render
from ..train import losses
from ..train.optim import adam_init, adam_update, apply_updates


def refine_pose(field: GaussianField, quat0, trans0, gt_image,
                cam: Camera, *, iters: int = 100, lr: float = 3e-3,
                sh_degree: int = 0, impl: str | None = None,
                max_instances: int = 0):
    """Optimize one frame's (quat, trans) photometrically; field frozen.

    Returns (quat, trans, final_loss). Jittable (static iters).
    """
    pose0 = {"q": quat0, "t": trans0}
    opt0 = adam_init(pose0)

    def loss_fn(pose):
        w2c = build_w2c(pose["q"], pose["t"])
        out = render(field.means, field.quats, field.log_scales,
                     field.logit_opacity, field.sh, w2c, cam,
                     active=field.active, sh_degree=sh_degree, impl=impl,
                     max_instances=max_instances,
                     gs_grad=False, cam_grad=True)
        # UNMASKED: with no flow anchor, a coverage mask lets the
        # optimizer shrink the evaluated region to easy pixels (masked
        # loss down, true PSNR down — observed). Full-frame photometric
        # error is the quantity PSNR measures.
        return losses.rgb_loss(out["render"], gt_image)

    grad_fn = jax.value_and_grad(loss_fn)

    def body(i, carry):
        pose, opt, best_loss, best_pose = carry
        loss, grads = grad_fn(pose)
        # best-pose carry: photometric refinement over a frozen map is
        # non-convex and an Adam trajectory can wander off (observed on
        # the round-3 checkpoint: raw test PSNR 18.6, "refined" 14.6).
        # Returning the best-loss iterate makes refinement monotone by
        # construction — it can only match or improve the initial pose.
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_pose = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), pose, best_pose)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        # cosine-ish decay: long tail helps the last fraction of a pixel
        cur_lr = lr * (0.1 + 0.9 * (1.0 - i / max(iters, 1)))
        upd, opt = adam_update(grads, opt, cur_lr)
        return apply_updates(pose, upd), opt, best_loss, best_pose

    _, _, best_loss, best_pose = jax.lax.fori_loop(
        0, iters, body, (pose0, opt0, jnp.float32(jnp.inf), pose0))
    return best_pose["q"], best_pose["t"], best_loss


def make_jitted_refine():
    return jax.jit(refine_pose,
                   static_argnames=("cam", "iters", "lr", "sh_degree",
                                    "impl", "max_instances"))


def refine_poses_scan(field: GaussianField, quats_all, trans_all,
                      colors_all, ts, cam: Camera, *, iters: int = 25,
                      lr: float = 1e-3, sh_degree: int = 0,
                      impl: str | None = None, max_instances: int = 0):
    """Refine many frames' poses against the frozen map in ONE jitted call.

    The training-time pose-BA pass (net-new over the reference, whose
    global stage never revisits poses — ``train.py:378-443``): the
    round-4/5 full-scale attribution measured psnr_train == psnr_test
    with ~78% relative per-frame translation error, i.e. the map is
    uniformly blurred by mutually inconsistent pose supervision.
    Alternating this pass with mapping chunks is block-coordinate descent
    on the joint photometric objective — the classical SLAM final-BA
    move, expressed TPU-style as a ``lax.scan`` over frames with the
    monotone best-pose ``refine_pose`` inner loop (a pose can only
    improve or keep its tracked value).

    ts: (K,) int32 frame indices to refine (pass train frames, usually
    excluding the pinned frame 0). Returns updated (quats_all, trans_all)
    with rows at ``ts`` replaced and a (K,) final-loss vector.
    """

    def body(carry, t):
        q_all, t_all = carry
        gt = jax.lax.dynamic_index_in_dim(colors_all, t, 0, False)
        q, tr, loss = refine_pose(field, q_all[t], t_all[t], gt, cam,
                                  iters=iters, lr=lr, sh_degree=sh_degree,
                                  impl=impl, max_instances=max_instances)
        return (q_all.at[t].set(q), t_all.at[t].set(tr)), loss

    (quats_all, trans_all), losses_out = jax.lax.scan(
        body, (quats_all, trans_all), jnp.asarray(ts, jnp.int32))
    return quats_all, trans_all, losses_out


def make_jitted_refine_scan():
    return jax.jit(refine_poses_scan,
                   static_argnames=("cam", "iters", "lr", "sh_degree",
                                    "impl", "max_instances"))


__all__ = ["refine_pose", "make_jitted_refine", "refine_poses_scan",
           "make_jitted_refine_scan"]
