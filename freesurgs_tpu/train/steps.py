"""Jitted training steps: per-frame tracking and mapping.

TPU-native redesign of the reference's hot loops (``FreeSurGS.tracking`` /
``FreeSurGS.mapping``, ``train.py:154-295``). The key structural change:
an entire optimization loop (50 tracking iterations, or a whole mapping
chunk including its densify events) is ONE jitted call built from
``lax.fori_loop`` — versus the reference's one python-dispatched
CUDA-kernel pair per iteration. Weights and schedules match ``train.py``:

  tracking: 1.0 * rgb(masked) + 0.1 * flow-reprojection, Adam lr 0.01
            step-decayed by 0.5 at thirds (train.py:86-89, pose_optimizer
            489-496)
  mapping:  5.0 * rgb + (0.05 * pearson + 0.15 * local-pearson) on inverse
            monocular depth prior (train.py:253-259), per-group Adam LRs
            from OptimizationParams (arguments/__init__.py:109-132),
            densify every 300 global mapping iterations while < 15000,
            opacity reset every 3000 (train.py:305-316).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.transforms import build_w2c
from ..models.gaussians import GaussianField
from ..ops.render import render
from . import losses
from .densify import DensifyConfig, DensifyStats, add_render_stats, \
    densify_and_prune, reset_opacity
from .optim import AdamState, adam_init, adam_update, apply_updates, \
    expon_lr, tracking_lr


class TrainConfig(NamedTuple):
    """The reference's hard-coded hypers (train.py:58-102 +
    arguments/__init__.py:109-132), unified."""
    tracking_iters: int = 50
    mapping_iters: int = 30
    first_frame_mapping_iters: int = 200
    global_iters: int = 30000
    densify_interval: int = 300
    densify_until: int = 15000
    opacity_reset_interval: int = 3000
    size_threshold_from: int = 4000
    sh_increase_interval: int = 1000
    # loss weights
    w_rgb_tracking: float = 1.0
    w_flow_tracking: float = 0.1
    w_rgb_mapping: float = 5.0
    w_pearson: float = 0.05
    w_local_pearson: float = 0.15
    # learning rates (OptimizationParams x spatial_lr_scale=5)
    spatial_lr_scale: float = 5.0
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_max_steps: int = 30000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    # keyframe policy for the second mapping view: "uniform" (random
    # keyframe — the reference train.py:236-244 behavior) or "overlap"
    # (viewpoint-overlap-weighted selection, the reference's
    # defined-but-uncalled keyframe_selection_overlap,
    # scene/pose_optimizer.py:534-577)
    keyframe_policy: str = "uniform"
    # Binning-layout amortization (ops/raster_pallas.BinState): rebin the
    # mapped CURRENT view every K optimizer iterations instead of every
    # iteration, reusing the tile layout in between (pixel membership
    # stays exact via the in-kernel fresh 16px rect mask; a gaussian that
    # outgrows its binned coverage loses the sliver until the next rebin).
    # Forced rebins on frame change and after densify/opacity-reset keep
    # reuse safe; 1 == the reference's rebin-every-iteration semantics.
    # Separate knob for tracking: pose steps move the whole image plane
    # (~10 px/iter early), so stale layouts cost accuracy faster there.
    rebin_every: int = 1
    rebin_tracking_every: int = 1
    # Gauss-Newton flow-PnP pose initialization before the photometric
    # Adam refinement (train/flow_pnp.py). Net-new quality lever over the
    # reference: its 50 first-order Adam steps stall at ~43% of the init
    # pose error on a frozen PERFECT map with exact flow
    # (scripts/tracking_probe.py), and at ~79% relative per-frame
    # translation error at full scale (BASELINE.md round-4 attribution) —
    # while the flow term is an analytic dense-PnP problem GN solves to
    # 0.03% in 2 iterations (11% under 0.5px flow + 2% depth noise).
    # 0 restores exact reference tracking semantics.
    tracking_gn_iters: int = 8
    tracking_gn_huber_px: float = 2.0
    # renderer
    max_instances: int = 0
    # Hard ceiling for auto-size/overflow growth of the instance buffer:
    # M-sized binning temporaries pad to ~512 B/instance transient HBM on
    # TPU, so an uncapped M (full-res frame 0 can touch 10M+ raw
    # instances) compiles to an OOM. At the cap, overflow drops
    # deepest-per-tile instances instead of growing.
    max_instances_cap: int = 3_145_728
    impl: str | None = None
    densify: DensifyConfig = DensifyConfig()

    def mapping_lrs(self, step):
        """Per-leaf LR pytree for the Gaussian Adam at global step."""
        xyz = expon_lr(step, self.position_lr_init * self.spatial_lr_scale,
                       self.position_lr_final * self.spatial_lr_scale,
                       self.position_lr_max_steps)
        return {
            "means": xyz,
            "quats": jnp.asarray(self.rotation_lr),
            "log_scales": jnp.asarray(self.scaling_lr),
            "logit_opacity": jnp.asarray(self.opacity_lr),
            "sh_dc": jnp.asarray(self.feature_lr),
            "sh_rest": jnp.asarray(self.feature_lr / 20.0),
        }


# ------------------------------------------------------------- tracking

def tracking_loop(field: GaussianField, quat0, trans0, gt_image, prev_depth,
                  prev_w2c, flow_fw_prev, rigid_mask, cam: Camera,
                  cfg: TrainConfig, sh_degree: int = 0, mesh=None):
    """Optimize one frame's (quat, trans) for cfg.tracking_iters Adam steps.

    All Gaussian parameters are frozen (gs_grad=False). Returns
    (quat, trans, metrics dict). Fully jittable; iteration count static.

    When cfg.tracking_gn_iters > 0 the pose is first refined by the
    Gauss-Newton flow-PnP solve (train/flow_pnp.py) — same inputs as the
    flow-reprojection loss, orders of magnitude closer to the optimum
    than Adam's budget allows — and the reference's Adam loop then
    fine-tunes photometrically from there. Frames whose previous frame
    has no rendered-depth cache (test frames are never mapped) carry
    zero effective GN weight and fall through to the init unchanged.
    """
    gn_diag = None
    if cfg.tracking_gn_iters > 0:
        from .flow_pnp import flow_pnp_refine
        quat0, trans0, gn_diag = flow_pnp_refine(
            quat0, trans0, prev_depth, prev_w2c, flow_fw_prev, cam,
            rigid_mask=rigid_mask, iters=cfg.tracking_gn_iters,
            huber_px=cfg.tracking_gn_huber_px)
    pose0 = {"q": quat0, "t": trans0}
    opt0 = adam_init(pose0)
    amortize = (cfg.rebin_tracking_every > 1 and mesh is None
                and cfg.impl != "oracle")

    def loss_fn(pose, bins_c, rebin):
        w2c = build_w2c(pose["q"], pose["t"])
        if mesh is not None:
            from ..parallel.sharded import render_sharded_full
            out = render_sharded_full(
                mesh, field.means, field.quats, field.log_scales,
                field.logit_opacity, field.sh, w2c, cam,
                active=field.active, sh_degree=sh_degree,
                impl=cfg.impl or "pallas",
                max_instances=cfg.max_instances,
                gs_grad=False, cam_grad=True)
        else:
            out = render(field.means, field.quats, field.log_scales,
                         field.logit_opacity, field.sh, w2c, cam,
                         active=field.active, sh_degree=sh_degree,
                         impl=cfg.impl, max_instances=cfg.max_instances,
                         gs_grad=False, cam_grad=True,
                         bins=bins_c, rebin=rebin)
        mask = (out["render_dep"] > 0) & (rigid_mask > 0)
        rgb = cfg.w_rgb_tracking * losses.rgb_loss(out["render"], gt_image,
                                                   mask=mask)
        flow = cfg.w_flow_tracking * losses.flow_projection_loss(
            prev_depth, prev_w2c, out["render_w2c"], flow_fw_prev, cam,
            rigid_mask=rigid_mask)
        return rgb + flow, (rgb, flow, out.get("bins"))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(i, carry):
        pose, opt, prev, bins_c = carry
        rebin = (jnp.equal(i % cfg.rebin_tracking_every, 0)
                 if amortize else None)
        (loss, (rgb, flow, bins_c)), grads = grad_fn(pose, bins_c, rebin)
        # NaN guard (reference keeps similar guards in its losses,
        # scene/pose_optimizer.py:213-214): a single non-finite gradient
        # must not poison the pose for all remaining iterations.
        nonfinite = prev[3] + sum(
            jnp.sum(~jnp.isfinite(g))
            for g in jax.tree.leaves(grads)).astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        lr = tracking_lr(i, cfg.tracking_iters)
        upd, opt = adam_update(grads, opt, lr)
        pose = apply_updates(pose, upd)
        return pose, opt, jnp.stack([loss, rgb, flow, nonfinite]), bins_c

    if amortize:
        from ..ops.raster_pallas import zero_bin_state
        from ..ops.render import raster_config
        bins0 = zero_bin_state(
            field.capacity,
            raster_config(cam, cfg.max_instances, field.capacity, cfg.impl))
    else:
        bins0 = None
    pose, _, last, _ = jax.lax.fori_loop(
        0, cfg.tracking_iters, body,
        (pose0, opt0, jnp.zeros(4, jnp.float32), bins0))
    metrics = {"loss": last[0], "rgb_loss": last[1],
               "flow_loss": last[2], "nonfinite_grads": last[3]}
    if gn_diag is not None:
        # Per-frame GN observability: final Huber-weighted mean flow-PnP
        # residual (px) and the effective point weight. gn_weight below
        # flow_pnp_refine's min_weight (64) means the degenerate-frame
        # guard zeroed every GN step (the pose fell through to the init) —
        # visible in metrics.jsonl instead of silently absorbed by Adam.
        metrics["gn_resid_px"] = gn_diag[0]
        metrics["gn_weight"] = gn_diag[1]
    return pose["q"], pose["t"], metrics


# -------------------------------------------------------------- mapping

class MappingState(NamedTuple):
    field: GaussianField
    opt: AdamState
    iteration: jnp.ndarray     # () int32 global mapping-step counter
    key: jax.Array
    pred_depths: jnp.ndarray   # (T, H, W) per-frame rendered-depth cache
    pred_colors: jnp.ndarray   # (T, 3, H, W) per-frame rendered-color cache


def _render_view(field: GaussianField, w2c, cam, cfg, sh_degree, probe,
                 mesh=None, bins=None, rebin=None):
    if mesh is not None:
        from ..parallel.sharded import render_sharded_full
        return render_sharded_full(
            mesh, field.means, field.quats, field.log_scales,
            field.logit_opacity, field.sh, w2c, cam, active=field.active,
            probe2d=probe, sh_degree=sh_degree,
            impl=cfg.impl or "pallas", max_instances=cfg.max_instances,
            gs_grad=True, cam_grad=False)
    return render(field.means, field.quats, field.log_scales,
                  field.logit_opacity, field.sh, w2c, cam,
                  active=field.active, probe2d=probe, sh_degree=sh_degree,
                  impl=cfg.impl, max_instances=cfg.max_instances,
                  gs_grad=True, cam_grad=False, bins=bins, rebin=rebin)


def mapping_chunk(state: MappingState,
                  colors_all, monodeps_all, w2c_all,
                  cur_ts, keyframes, n_keyframes,
                  cam: Camera, cfg: TrainConfig,
                  two_views: bool, sh_degree: int,
                  densify_enabled: bool = True, mesh=None):
    """Run ``len(cur_ts)`` mapping iterations as ONE jitted call.

    Mirrors FreeSurGS.mapping + densification (train.py:213-316):
    - cur_ts (n_iters,) int32: the frame mapped at each iteration
      (progressive mode repeats one frame; the global stage passes a
      pre-sampled random i_train sequence, train.py:382).
    - two_views: add a random-keyframe view per iteration
      (train.py:236-244); densification stats come from that view only
      (train.py:260-263).
    - densify every cfg.densify_interval global iterations while below
      cfg.densify_until; opacity reset every cfg.opacity_reset_interval
      (train.py:305-316) — all as lax.cond inside the scan.
    - after each iteration the mapped frame's rendered depth/color are
      written into the prediction caches (train.py:343-344, 392-393),
      which the next tracking step consumes.

    colors_all (T, 3, H, W) and monodeps_all (T, H, W) stay resident in
    HBM; views are gathered by dynamic indexing.
    Returns (state, aux) with last-iteration diagnostics.
    """

    def one_iter(state: MappingState, cur_t, bins_c=None, rebin=None,
                 kf_pos_pre=None, kf_bins_c=None, kf_rebin=None):
        field, opt, iteration, key = (state.field, state.opt,
                                      state.iteration, state.key)
        key, k_kf, k_lp1, k_lp2 = jax.random.split(key, 4)

        def view_loss(params, probe, t_idx, lp_key, bins=None, rb=None):
            f = field.replace(**params)
            out = _render_view(f, w2c_all[t_idx], cam, cfg, sh_degree,
                               probe, mesh=mesh, bins=bins, rebin=rb)
            gt = jax.lax.dynamic_index_in_dim(colors_all, t_idx, 0, False)
            mono = jax.lax.dynamic_index_in_dim(monodeps_all, t_idx, 0,
                                                False)
            rgb = cfg.w_rgb_mapping * losses.rgb_loss(out["render"], gt)
            pear = cfg.w_pearson * losses.pearson_depth_loss(
                mono, out["render_dep"])
            lpear = cfg.w_local_pearson * losses.local_pearson_loss(
                mono, out["render_dep"], lp_key)
            terms = jnp.stack([rgb, pear, lpear])
            return rgb + pear + lpear, (out, terms)

        params = field.param_dict()
        probe0 = jnp.zeros((field.capacity, 2), jnp.float32)

        if two_views:
            if kf_pos_pre is not None:
                # amortized path: the chunk's keyframe draws were
                # presampled and value-grouped (same multiset, sorted
                # order) so the keyframe view's binning layout can be
                # carried across equal-keyframe runs — the same
                # distribution-preserving reordering the global stage
                # applies to its random frame visits (train/loop.py
                # global_run).
                kf_pos = kf_pos_pre
            elif cfg.keyframe_policy == "overlap":
                # Viewpoint-overlap selection (pose_optimizer.py:534-577):
                # back-project the current frame's depth prior, score each
                # keyframe by reprojected visibility, pick randomly among
                # positive-overlap candidates.
                from .keyframes import keyframe_overlap_scores, \
                    select_overlap_keyframes
                cur_depth = jax.lax.dynamic_index_in_dim(
                    monodeps_all, cur_t, 0, False)
                scores = keyframe_overlap_scores(
                    cur_depth, w2c_all[cur_t], w2c_all[keyframes], cam,
                    k_kf)
                n_kf = jnp.maximum(n_keyframes, 1)
                scores = jnp.where(
                    jnp.arange(scores.shape[0]) < n_kf, scores, 0.0)
                key, k_sel = jax.random.split(key)
                kf_pos = select_overlap_keyframes(scores, k_sel, 1)[0]
            else:
                kf_pos = jax.random.randint(k_kf, (), 0,
                                            jnp.maximum(n_keyframes, 1))
            kf_t = keyframes[kf_pos]

            def total_loss(params, probe):
                l0, (out0, _) = view_loss(params, probe, kf_t, k_lp1,
                                          kf_bins_c, kf_rebin)
                l1, (out1, terms1) = view_loss(params, None, cur_t, k_lp2,
                                               bins_c, rebin)
                return l0 + l1, (out0, out1, terms1)

            (loss, (out0, out1, terms)), grads = jax.value_and_grad(
                total_loss, argnums=(0, 1), has_aux=True)(params, probe0)
            pgrads, probe_grad = grads
            stats_out = out0
            cur_out = out1
        else:
            def total_loss(params, probe):
                l, (out, terms) = view_loss(params, probe, cur_t, k_lp1,
                                            bins_c, rebin)
                return l, (out, terms)

            (loss, (out, terms)), grads = jax.value_and_grad(
                total_loss, argnums=(0, 1), has_aux=True)(params, probe0)
            pgrads, probe_grad = grads
            stats_out = out
            cur_out = out

        iteration = iteration + 1

        # NaN guard, same rationale as the tracking loop's: a single
        # non-finite gradient (degenerate view, numerical edge) must not
        # poison the whole field for the rest of the chunk. Counts are
        # surfaced PER PARAMETER GROUP in the chunk diagnostics so a live
        # run shows WHERE numerical trouble starts instead of silently
        # training through it (round-2 ran with a single joint count and
        # its divergence could not be localized from the logs).
        nf_groups = jnp.stack(
            [jnp.sum(~jnp.isfinite(pgrads[k])).astype(jnp.float32)
             for k in ("means", "quats", "log_scales", "logit_opacity",
                       "sh_dc", "sh_rest")]
            + [jnp.sum(~jnp.isfinite(probe_grad)).astype(jnp.float32)])
        nonfinite = jnp.sum(nf_groups)
        pgrads, probe_grad = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0),
            (pgrads, probe_grad))

        # densification statistics from the stats view (train.py:261-263,
        # 297-303); the probe cotangent is in pixels, the reference's
        # threshold units are half-NDC (see add_render_stats).
        ndc_scale = jnp.asarray([0.5 * cam.width, 0.5 * cam.height],
                                jnp.float32)
        field = add_render_stats(field, probe_grad, stats_out["radii"],
                                 stats_out["visibility"],
                                 grad_scale=ndc_scale)

        upd, opt = adam_update(pgrads, opt, cfg.mapping_lrs(iteration))
        field = field.replace(**apply_updates(params, upd))

        did_surgery = jnp.bool_(False)
        zero_stats = DensifyStats(*(jnp.zeros((), jnp.int32)
                                    for _ in DensifyStats._fields))
        dstats = zero_stats
        if densify_enabled:
            key, k_dens = jax.random.split(key)

            def do_densify(args):
                f, o = args
                return densify_and_prune(
                    f, o, k_dens, cfg.densify,
                    use_screen_size=iteration > cfg.size_threshold_from)

            densify_now = ((iteration % cfg.densify_interval == 0)
                           & (iteration < cfg.densify_until))
            field, opt, dstats = jax.lax.cond(
                densify_now, do_densify,
                lambda a: (a[0], a[1], zero_stats), (field, opt))

            field, opt = jax.lax.cond(
                iteration % cfg.opacity_reset_interval == 0,
                lambda a: reset_opacity(*a), lambda a: a, (field, opt))
            # Densify moves gaussians between slots; a reused BinState
            # would index the wrong data. Opacity reset only shrinks
            # coverage (stale instances mask exactly) but is grouped in
            # for simplicity — both are rare (every 300 / 3000 iters).
            did_surgery = densify_now | (
                iteration % cfg.opacity_reset_interval == 0)

        pred_depths = jax.lax.dynamic_update_index_in_dim(
            state.pred_depths,
            cur_out["render_dep"].astype(state.pred_depths.dtype), cur_t, 0)
        pred_colors = jax.lax.dynamic_update_index_in_dim(
            state.pred_colors,
            jnp.clip(cur_out["render"], 0.0, 1.0
                     ).astype(state.pred_colors.dtype), cur_t, 0)
        new_state = MappingState(field, opt, iteration, key, pred_depths,
                                 pred_colors)
        bins_out = cur_out.get("bins")
        kf_bins_out = stats_out.get("bins") if two_views else None
        n_inst = (bins_out.num_instances.astype(jnp.float32)
                  if bins_out is not None else jnp.float32(-1))
        diag = jnp.concatenate([
            jnp.stack([loss, cur_out["overflow"].astype(jnp.float32),
                       nonfinite]),
            terms,        # [3:6] rgb / pearson / local-pearson (cur view)
            nf_groups,    # [6:13] per-group nonfinite grad entries
            n_inst[None],  # [13] binned instances (amortized path; -1 else)
            # [14:20] densify-event attribution (zeros on non-event iters):
            # cloned / split / pruned_opacity / pruned_world /
            # pruned_screen / dropped-children
            jnp.stack([dstats.cloned, dstats.split, dstats.pruned_opacity,
                       dstats.pruned_world, dstats.pruned_screen,
                       dstats.dropped]).astype(jnp.float32),
        ])
        return new_state, diag, bins_out, kf_bins_out, did_surgery

    amortize = (cfg.rebin_every > 1 and mesh is None
                and cfg.impl != "oracle")
    # The keyframe (densify-stats) view changes every iteration (random
    # draw), so a single-layout carry cannot amortize it. Presampling the
    # chunk's draws and value-grouping them (same multiset, sorted order —
    # the same distribution-preserving reordering global_run applies to
    # its random frame visits) turns repeats into layout reuse; binning
    # cost scales with instance CAPACITY, not occupancy, so at full-res
    # capacities this is the dominant per-iteration cost of the second
    # view.
    amortize_kf = (amortize and two_views
                   and cfg.keyframe_policy == "uniform")
    if amortize:
        from ..ops.raster_pallas import zero_bin_state
        from ..ops.render import raster_config
        cap = state.field.capacity
        bins0 = zero_bin_state(
            cap, raster_config(cam, cfg.max_instances, cap, cfg.impl))
        n_iters = cur_ts.shape[0]

        if amortize_kf:
            key, k_seq = jax.random.split(state.key)
            state = state._replace(key=key)
            kf_pos_seq = jnp.sort(jax.random.randint(
                k_seq, (n_iters,), 0, jnp.maximum(n_keyframes, 1)))

            def scan_body(carry, x):
                st, bins_c, kf_bins_c, prev_t, prev_kf, force = carry
                cur_t, k, kf_pos = x
                rebin = (force | (cur_t != prev_t)
                         | (k % cfg.rebin_every == 0))
                # same parameter-drift staleness bound as the cur view
                kf_rebin = (force | (kf_pos != prev_kf)
                            | (k % cfg.rebin_every == 0))
                st, diag, new_bins, new_kf_bins, surgery = one_iter(
                    st, cur_t, bins_c, rebin, kf_pos_pre=kf_pos,
                    kf_bins_c=kf_bins_c, kf_rebin=kf_rebin)
                return (st, new_bins, new_kf_bins, cur_t, kf_pos,
                        surgery), diag

            (state, _, _, _, _, _), diag = jax.lax.scan(
                scan_body,
                (state, bins0, bins0, jnp.int32(-1), jnp.int32(-1),
                 jnp.bool_(True)),
                (cur_ts, jnp.arange(n_iters, dtype=jnp.int32), kf_pos_seq))
        else:
            def scan_body(carry, x):
                st, bins_c, prev_t, force = carry
                cur_t, k = x
                rebin = (force | (cur_t != prev_t)
                         | (k % cfg.rebin_every == 0))
                st, diag, new_bins, _, surgery = one_iter(st, cur_t, bins_c,
                                                          rebin)
                return (st, new_bins, cur_t, surgery), diag

            (state, _, _, _), diag = jax.lax.scan(
                scan_body, (state, bins0, jnp.int32(-1), jnp.bool_(True)),
                (cur_ts, jnp.arange(n_iters, dtype=jnp.int32)))
    else:
        def scan_body(carry, cur_t):
            st, diag, _, _, _ = one_iter(carry, cur_t)
            return st, diag

        state, diag = jax.lax.scan(scan_body, state, cur_ts)
    group_names = ("means", "quats", "log_scales", "logit_opacity",
                   "sh_dc", "sh_rest", "probe2d")
    n_it = diag.shape[0]
    any_nf = diag[:, 2] > 0
    aux = {"loss": diag[-1, 0], "overflow_max": jnp.max(diag[:, 1]),
           "nonfinite_grads": jnp.sum(diag[:, 2]),
           "loss_terms": diag[-1, 3:6],   # rgb / pearson / local-pearson
           "nonfinite_by_group": {
               k: jnp.sum(diag[:, 6 + i]) for i, k in enumerate(group_names)},
           # first in-chunk iteration with any nonfinite grad (n_it = none)
           "first_nonfinite_iter": jnp.where(
               jnp.any(any_nf),
               jnp.argmax(any_nf), jnp.int32(n_it)),
           "iteration": state.iteration,
           "num_instances_max": jnp.max(diag[:, 13]),
           # chunk totals over densify events (per-cause prune attribution
           # — the alarm for over-pruning regressions like round 3's
           # 131k -> 59k active collapse)
           "densify_totals": {
               k: jnp.sum(diag[:, 14 + i]) for i, k in enumerate(
                   ("cloned", "split", "pruned_opacity", "pruned_world",
                    "pruned_screen", "dropped"))},
           "num_active": state.field.num_active}
    return state, aux


def make_jitted_mapping(cam: Camera, cfg: TrainConfig,
                        donate: bool = False):
    """jit wrapper with the static args bound.

    ``donate=True`` donates the MappingState argument so XLA aliases its
    ~GB-scale buffers (field + optimizer moments + prediction caches)
    with the output state instead of holding both live across the call —
    at full-res capacities that is ~1-2 GB of peak HBM and the
    fragmentation churn of freeing/reallocating it every chunk (the
    round-4 TPU worker crashes happened at peak-memory global chunks).
    Callers that reuse a state across calls (tests) must keep the
    default."""
    return jax.jit(
        mapping_chunk,
        donate_argnums=(0,) if donate else (),
        static_argnames=("cam", "cfg", "two_views", "sh_degree",
                         "densify_enabled", "mesh"))


def make_jitted_tracking(cam: Camera, cfg: TrainConfig):
    return jax.jit(tracking_loop,
                   static_argnames=("cam", "cfg", "sh_degree", "mesh"))
