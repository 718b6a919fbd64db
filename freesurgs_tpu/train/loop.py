"""Training orchestrator: progressive SLAM loop + global refinement.

TPU-native equivalent of ``class FreeSurGS`` (``train.py:32-443``). The
host-side loop only sequences jitted device calls and rare capacity-growth
events; all per-iteration math lives in ``train/steps.py``.

Stage structure (reference ``progressive_run`` / ``global_run`` /
``validation``):
 1. frame 0: initialize the Gaussian field from a masked back-projection of
    the monocular depth prior, then 200 mapping iterations;
 2. frames t>0: constant-velocity pose init -> 50-iteration tracking (with
    the epipolar rigidity mask from frames t-2/t-1) -> 30 mapping
    iterations on {random keyframe, t} for train frames; cache rendered
    depth/color;
 3. global refinement: 30k single-iteration mapping steps over random train
    frames (run in jitted chunks), SH degree stepped every 1000;
 4. validation: test-view PSNR/SSIM/LPIPS + sim(3)-aligned ATE/RPE.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..models import pose as posemod
from ..models.gaussians import GaussianField, from_rgbd, grow_capacity
from ..models.pose import PoseTable, identity_poses
from ..ops.render import render
from .optim import adam_init
from .steps import MappingState, TrainConfig, make_jitted_mapping, \
    make_jitted_tracking


def create_random_mask(num_pixels: int, frac: float, seed: int = 0):
    """Keep ``frac`` of pixels (reference ``create_random_mask``,
    ``utils/general_utils.py:126-139``)."""
    rng = np.random.default_rng(seed)
    k = int(frac * num_pixels)
    mask = np.zeros(num_pixels, bool)
    mask[rng.permutation(num_pixels)[:k]] = True
    return mask


@dataclasses.dataclass
class Trainer:
    """Holds the full training state and drives the stages.

    ``seq`` is any object with the VideoSequence interface
    (``data/scared.py``) — colors (T,3,H,W), flows_fw (T-1,2,H,W),
    monodeps (T,H,W), cam, i_train/i_test, gt_poses, boundaries.
    """

    seq: Any
    cfg: TrainConfig = TrainConfig()
    sh_degree_max: int = 3
    global_chunk: int = 100
    init_mask_frac: float = 0.1
    capacity: int | None = None
    seed: int = 6666
    log_fn: Any = print
    checkpoint_dir: str | None = None     # periodic saves (reference
    checkpoint_every: int = 5000          # saves every 5000, train.py:437)
    mesh: Any = None                      # jax Mesh: band-sharded mapping
                                          # (multi-chip; None = single)
    viewer: Any = None                    # GSViewer (or any object with
                                          # wait_if_paused/report): both
                                          # loops cooperate, train.py:227-231
    pose_init: str = "const_velocity"     # tracking init for frames t>1:
                                          # "const_velocity" (reference
                                          # default, pose_optimizer.py:501)
                                          # or "pnp" (RANSAC PnP on flow
                                          # matches — the reference's
                                          # pnp=True branch, :517-532)
    cache_test_frames: bool = True        # after tracking a TEST frame,
                                          # render+cache its depth/color.
                                          # Test frames are never mapped,
                                          # so the reference leaves their
                                          # prediction cache empty
                                          # (train.py:341-345) and the
                                          # NEXT frame's flow losses (and
                                          # our GN flow-PnP, which guards
                                          # to a no-op on zero depth) run
                                          # blind — ~1/8 of frames on the
                                          # every-8th test split. One
                                          # forward render per test frame
                                          # closes the gap; False =
                                          # reference-literal behavior
    pose_ba_every: int = 0                # global-stage pose BA cadence
                                          # (0 = off, reference parity —
                                          # the reference never revisits
                                          # poses after tracking,
                                          # train.py:378-443). When >0,
                                          # every N global iters the train
                                          # -frame poses are photometric-
                                          # ally refined against the
                                          # frozen map (monotone best-pose
                                          # refine, eval/pose_refine.py)
                                          # — block-coordinate descent on
                                          # the joint objective targeting
                                          # the measured mutual-
                                          # inconsistency blur
    pose_ba_iters: int = 25
    pose_ba_lr: float = 1e-3
    metrics_logger: Any = None            # MetricsLogger (utils/logging):
                                          # history rows stream to
                                          # metrics.jsonl. Flushes happen
                                          # at the log cadence (the rows
                                          # hold device scalars; flushing
                                          # converts long-finished values
                                          # without a fresh device sync)
    panel_fn: Any = None                  # callable(name, hwc_img, step):
                                          # labeled comparison panels
                                          # (reference train.py:349-365)
    panel_every: int = 25                 # emit every N mapped frames
    validation_every: int = 5000          # mid-global test-view eval
                                          # cadence (train.py:401-425);
                                          # 0 disables
    max_capacity: int = 589_824           # slot-pool growth ceiling.
                                          # Measured on the v5e tunnel
                                          # (scripts/mem_probe.py,
                                          # populated fields): the global
                                          # chunk at capacity 786432 is
                                          # 10.4 GB live and crashes the
                                          # TPU worker (3/3 runs died at
                                          # exactly that growth); 589824
                                          # is 8.4 GB and runs. Past the
                                          # ceiling densify children drop
                                          # (counted) with a warning
                                          # instead of OOMing.

    def __post_init__(self):
        seq = self.seq
        self.cam: Camera = seq.cam
        self.num_frames = seq.colors.shape[0]
        H, W = self.cam.height, self.cam.width

        self.colors = jnp.asarray(seq.colors)
        self.monodeps = jnp.asarray(seq.monodeps)
        self.flows_fw = jnp.asarray(seq.flows_fw)
        self.K = jnp.asarray(self.cam.intrinsic_matrix())

        self.poses: PoseTable = identity_poses(self.num_frames)
        self.active_sh_degree = 0
        self.key = jax.random.PRNGKey(self.seed)

        # frame 0 cache = monodepth prior (train.py:41-42). The caches
        # live bf16: at full res they are the largest state tensors
        # (~970 MB f32 for 46 frames) and their consumers tolerate ~3
        # decimal digits — the next tracking step's flow-reprojection
        # (depth rel-err 2^-9 shifts the induced flow by ~f*|t|*0.2% ~
        # 0.02 px) and the viewer panels. The round-4 OOM crash happened
        # exactly at peak state (capacity 786k + instance buffer 3.1M).
        pred_depths = jnp.zeros((self.num_frames, H, W), jnp.bfloat16
                                ).at[0].set(
                                    self.monodeps[0].astype(jnp.bfloat16))
        pred_colors = jnp.zeros((self.num_frames, 3, H, W), jnp.bfloat16)

        # Gaussian field init from frame 0 (train.py:44)
        mask = create_random_mask(H * W, self.init_mask_frac, self.seed)
        field = from_rgbd(self.colors[0], self.monodeps[0], self.cam,
                          jnp.eye(4), mask, self.sh_degree_max,
                          self.capacity)
        self.log_fn(f"init gaussians: {int(field.num_active)} "
                    f"(capacity {field.capacity}), scene_radius "
                    f"{float(field.scene_radius):.3f}")
        self.state = MappingState(
            field=field, opt=adam_init(field.param_dict()),
            iteration=jnp.zeros((), jnp.int32), key=self.key,
            pred_depths=pred_depths, pred_colors=pred_colors)

        # auto-size the instance buffer from frame 0's actual tile
        # coverage (binning cost scales with this capacity; the overflow
        # check grows it later if the map densifies past the margin)
        if not self.cfg.max_instances:
            from ..ops.projection import project_gaussians
            from ..ops.raster_pallas import effective_bin_tiles

            def probe(f):
                proj = project_gaussians(
                    f.means, jnp.exp(f.log_scales), f.quats, self.cam,
                    active=f.active)
                opac = jax.nn.sigmoid(f.logit_opacity)
                return jnp.sum(effective_bin_tiles(proj, opac, 2))

            total = int(jax.jit(probe)(field))
            # 1.5x margin over the EFFECTIVE (pruned+snug, 32px) count;
            # _check_overflow grows it adaptively if densification blows
            # past it, up to the hard cap (HBM: M-sized gather temps pad
            # their minor dim to 128 lanes, ~512 B/instance transient).
            m = max(-(-int(1.5 * total) // 128) * 128, 4096)
            m = min(m, self.cfg.max_instances_cap)
            self.log_fn(f"auto max_instances: {m} "
                        f"(frame-0 effective instances {total})")
            self.cfg = self.cfg._replace(max_instances=m)

        self.keyframes: list[int] = []
        self.cur_frame = 0        # viewer anchor: most recent frame pose
        # One continuing random stream for the global stage: chunked
        # global_run() calls must NOT replay the same frame-sampling
        # sequence (they did in round 2 — the rng was re-seeded per call).
        self._global_rng = np.random.default_rng(self.seed + 1)
        self._mapping = make_jitted_mapping(self.cam, self.cfg,
                                            donate=True)
        self._tracking = make_jitted_tracking(self.cam, self.cfg)
        # Field-health probe (numerical diagnostics at logging cadence).
        def health(f):
            act = f.active
            big = jnp.where(act, f.log_scales.max(1), -jnp.inf)
            small = jnp.where(act, f.log_scales.min(1), jnp.inf)
            nonfinite = sum(jnp.sum(~jnp.isfinite(x))
                            for x in jax.tree.leaves(f.param_dict()))
            return {
                "max|xyz|": jnp.max(jnp.where(act[:, None], jnp.abs(f.means),
                                              0.0)),
                "logs_max": jnp.max(big),
                "logs_min": jnp.min(small),
                "opacl_max": jnp.max(jnp.where(act, f.logit_opacity,
                                               -jnp.inf)),
                "opacl_min": jnp.min(jnp.where(act, f.logit_opacity,
                                               jnp.inf)),
                "nonfinite_params": nonfinite,
            }
        self._health = jax.jit(health)
        self._rigidity = jax.jit(
            lambda poses, t1, t2, flow: posemod.epipolar_rigidity(
                poses, t1, t2, flow, self.cam, self.K)[1])
        self.history: list[dict] = []

    # ------------------------------------------------------------ helpers
    @property
    def field(self) -> GaussianField:
        return self.state.field

    def _maybe_grow(self, every: int = 1):
        """Grow capacity when the slot pool is nearly full (host event).

        ``every`` rate-limits the device->host occupancy read: on tunneled
        backends a host sync is expensive, so the progressive loop checks
        every few frames only (capacity has 10% headroom + growth is 2x,
        so a few densify events of slack are safe).
        """
        self._grow_tick = getattr(self, "_grow_tick", 0) + 1
        if self._grow_tick % every:
            return
        n_act = int(self.field.num_active)
        cap = self.field.capacity
        if n_act > 0.9 * cap:
            if cap >= self.max_capacity:
                self.log_fn(f"WARNING: slot pool saturated at the "
                            f"max_capacity cap {cap} (active {n_act}): "
                            "densify children are being dropped")
                return
            # 2x growth: each growth event recompiles every jitted step
            # (~1-2 min through the tunnel), so fewer, larger growths win
            # over tight memory packing (v5e HBM is not the binding
            # constraint at these capacities).
            new_cap = min(-(-int(cap * 2.0) // 4096) * 4096,
                          self.max_capacity)
            self.log_fn(f"growing capacity {cap} -> {new_cap} "
                        f"(active {n_act})")
            field = grow_capacity(self.field, new_cap)
            opt = self.state.opt

            def pad(x):
                if x.ndim == 0 or x.shape[0] != cap:
                    return x
                return jnp.pad(x, [(0, new_cap - cap)]
                               + [(0, 0)] * (x.ndim - 1))

            opt = opt.replace(mu=jax.tree.map(pad, opt.mu),
                              nu=jax.tree.map(pad, opt.nu))
            self.state = self.state._replace(field=field, opt=opt)
            # Old-capacity executables are dead weight from here on —
            # their device code (~0.1 GB each) and cached buffer layouts
            # contribute to the HBM fragmentation that crashed the
            # round-4 worker at peak capacity. The persistent
            # compilation cache makes any unexpected re-trace cheap.
            for fn in (self._mapping, self._tracking):
                if hasattr(fn, "clear_cache"):
                    fn.clear_cache()

    def _check_overflow(self, aux):
        """Grow the instance-buffer capacity when the binner dropped
        instances (device scalar read — call at logging cadence only).
        Triggers a one-off recompile of the jitted steps."""
        ov = float(aux.get("overflow_max", 0.0))
        if ov > 0:
            cur = self.cfg.max_instances or 0
            new_m = -(-int((cur + ov) * 1.5) // 128) * 128
            new_m = min(new_m, self.cfg.max_instances_cap)
            if new_m <= cur:
                # At the HBM-safety cap: keep training, but be honest about
                # what drops — the binner's layout is tile-major, so at the
                # cap the instance buffer truncates SUFFIX TILES (bottom of
                # the image renders background). Sustained overflow at the
                # cap therefore corrupts training and must be fixed at the
                # source (densify/prune balance), not absorbed here.
                self.log_fn(f"WARNING: instance overflow {int(ov)} at the "
                            f"max_instances cap {cur}: suffix tiles render "
                            "EMPTY — quality is compromised while this "
                            "persists")
                return
            self.log_fn(f"instance overflow {int(ov)}: max_instances "
                        f"{cur} -> {new_m} (recompiling)")
            self.cfg = self.cfg._replace(max_instances=new_m)
            self._mapping = make_jitted_mapping(self.cam, self.cfg,
                                            donate=True)
            self._tracking = make_jitted_tracking(self.cam, self.cfg)

    def right_size_instances(self, margin: float = 1.3,
                             sample_frames: int = 8) -> bool:
        """Shrink the instance buffer to the field's ACTUAL coverage.

        Every binning pass scales with the buffer capacity, not
        occupancy. The auto-sizer sizes from frame 0 (1.5x margin) and
        overflow only ever grows it — but the map's per-gaussian extent
        SHRINKS as training refines (measured: M/N 7.9 at init vs 2.73
        at global iter 7500, leaving the frame-0 buffer 1.63x oversized
        for the whole global stage). Probes effective instances at up to
        ``sample_frames`` evenly-spaced mapped-frame poses and resizes to
        margin x max (shrink only; overflow growth still applies).
        Returns True if it resized (one recompile)."""
        from ..ops.projection import project_gaussians
        from ..ops.raster_pallas import effective_bin_tiles

        f = self.field
        w2c_all = jax.lax.stop_gradient(self.poses.all_w2c())
        frames = (self.keyframes or [0])[:: max(
            1, len(self.keyframes or [0]) // sample_frames)]

        def probe(f, w2c):
            from ..core.transforms import transform_points
            mean_cam = transform_points(w2c, f.means)
            proj = project_gaussians(mean_cam, jnp.exp(f.log_scales),
                                     f.quats, self.cam, active=f.active)
            return jnp.sum(effective_bin_tiles(
                proj, jax.nn.sigmoid(f.logit_opacity), 2))

        pj = jax.jit(probe)
        worst = max(int(pj(f, w2c_all[t])) for t in frames)
        cur = self.cfg.max_instances or 0
        new_m = max(-(-int(margin * worst) // 128) * 128, 4096)
        if new_m >= cur:
            return False
        self.log_fn(f"right-sizing max_instances {cur} -> {new_m} "
                    f"(worst sampled coverage {worst}, margin {margin}x)")
        self.cfg = self.cfg._replace(max_instances=new_m)
        self._mapping = make_jitted_mapping(self.cam, self.cfg,
                                            donate=True)
        self._tracking = make_jitted_tracking(self.cam, self.cfg)
        return True

    def _update_sh_degree(self):
        it = int(self.state.iteration)
        want = min(it // self.cfg.sh_increase_interval, self.sh_degree_max)
        if want > self.active_sh_degree:
            self.active_sh_degree = want
            self.log_fn(f"SH degree -> {want}")

    def _report_nonfinite(self, aux, where: str):
        """Log the per-group nonfinite-gradient attribution when a chunk
        saw any (one host sync — only taken on the bad path)."""
        if float(aux.get("nonfinite_grads", 0.0)) <= 0:
            return
        groups = {k: int(v) for k, v in aux["nonfinite_by_group"].items()
                  if float(v) > 0}
        h = {k: float(v) for k, v in self._health(self.field).items()}
        self.log_fn(
            f"NONFINITE grads at {where}: "
            f"total={float(aux['nonfinite_grads']):.3g} "
            f"first_iter={int(aux['first_nonfinite_iter'])} "
            f"by_group={groups} health={ {k: round(v, 3) for k, v in h.items()} }")

    def _rigid_mask(self, t: int):
        if t <= 1:
            return jnp.ones((self.cam.height, self.cam.width))
        sampson = self._rigidity(self.poses, t - 2, t - 1,
                                 self.flows_fw[t - 2])
        return posemod.adaptive_threshold_mask(sampson).astype(jnp.float32)

    def _emit_panel(self, t: int, name: str = "compare"):
        """Labeled render | GT | depth | flow comparison panel (the
        reference's per-mapped-frame wandb images, ``train.py:349-365``,
        layout per ``vis/layout.py:109-214``)."""
        if self.panel_fn is None:
            return
        from ..utils.image import (add_label, colorize_depth, colorize_flow,
                                   hcat)
        out = self.render_frame(t)
        parts = [
            add_label(np.clip(np.asarray(out["render"]), 0, 1), "render"),
            add_label(np.asarray(self.colors[t]), "gt"),
            add_label(colorize_depth(np.asarray(out["render_dep"])),
                      "depth"),
            add_label(colorize_depth(np.asarray(self.monodeps[t])),
                      "monodep"),
        ]
        if t + 1 < self.num_frames:
            parts.append(add_label(
                colorize_flow(np.asarray(self.flows_fw[t])), "flow"))
        self.panel_fn(f"{name}_f{t:04d}", hcat(*parts),
                      int(self.state.iteration))

    def _viewer_tick(self, rays_per_sec: float | None = None):
        v = self.viewer
        if v is None:
            return
        if hasattr(v, "report"):
            v.report(rays_per_sec=rays_per_sec, frame=self.cur_frame)
        v.wait_if_paused()

    def _map_frame(self, t: int, n_iters: int, two_views: bool):
        kf = jnp.asarray(self.keyframes or [0], jnp.int32)
        kf_pad = jnp.zeros((self.num_frames,), jnp.int32
                           ).at[:len(kf)].set(kf)
        self.state, aux = self._mapping(
            self.state, self.colors, self.monodeps,
            jax.lax.stop_gradient(self.poses.all_w2c()),
            jnp.full((n_iters,), t, jnp.int32), kf_pad,
            jnp.int32(len(self.keyframes) or 1),
            cam=self.cam, cfg=self.cfg, two_views=two_views,
            sh_degree=self.active_sh_degree, densify_enabled=True,
            mesh=self.mesh)
        return aux

    # ------------------------------------------------------------- stages
    def _flush_history(self):
        """Stream unflushed history rows to metrics.jsonl (no-op without a
        metrics_logger). Called at the logging cadence: the rows' device
        scalars are from already-finished steps, so the float conversions
        do not stall the device queue the way per-frame reads would."""
        if self.metrics_logger is None:
            return
        start = getattr(self, "_history_flushed", 0)
        for row in self.history[start:]:
            self.metrics_logger.log(
                {k: (float(v) if hasattr(v, "__float__") else v)
                 for k, v in row.items()})
        self._history_flushed = len(self.history)

    def track_frame(self, t: int):
        if t > 1:
            if self.pose_init == "pnp":
                self.poses = posemod.pnp_pose_init(
                    self.poses, t, self.flows_fw[t - 1],
                    self.state.pred_depths[t - 1].astype(jnp.float32),
                    self.poses.w2c(t - 1), self.cam, seed=self.seed + t)
            else:
                self.poses = posemod.const_velocity_init(self.poses, t)
        elif t == 1:
            self.poses = posemod.copy_previous_init(self.poses, t)
        rigid = self._rigid_mask(t)
        q, tr, metrics = self._tracking(
            self.field, self.poses.quats[t], self.poses.trans[t],
            self.colors[t], self.state.pred_depths[t - 1],
            jax.lax.stop_gradient(self.poses.w2c(t - 1)),
            self.flows_fw[t - 1], rigid, self.cam, self.cfg,
            sh_degree=self.active_sh_degree, mesh=self.mesh)
        self.poses = self.poses.set_frame(t, q, tr)
        return metrics

    def progressive_run(self):
        i_train = set(int(i) for i in self.seq.i_train)
        from ..utils.profiling import StepTimer
        timer = StepTimer(self.cam.height, self.cam.width)
        t0 = time.time()
        # Host-gap overlap: every device-scalar read (aux overflow,
        # occupancy) blocks the host until that frame's chunk finishes,
        # so reading frame t's scalars BEFORE dispatching frame t+1
        # leaves the device idle for one tunnel round-trip + host
        # bookkeeping per frame. Deferring the reads one frame keeps the
        # device queue non-empty: frame t+1's tracking+mapping are
        # dispatched first, then the (long-finished) frame-t scalars are
        # read while the device works. Growth/overflow reactions lag one
        # mapped frame; both have sizing margins for that.
        pending: tuple | None = None    # (frame, aux) awaiting scalar reads
        for t in range(self.num_frames):
            timer.start()
            self.cur_frame = t
            metrics = {}
            if t > 0:
                metrics = self.track_frame(t)
            if t not in i_train and self.cache_test_frames:
                # see the cache_test_frames knob: keep the flow/GN depth
                # chain alive across unmapped test frames
                out = self.render_frame(t)
                st = self.state
                self.state = st._replace(
                    pred_depths=st.pred_depths.at[t].set(
                        out["render_dep"].astype(st.pred_depths.dtype)),
                    pred_colors=st.pred_colors.at[t].set(
                        jnp.clip(out["render"], 0.0, 1.0
                                 ).astype(st.pred_colors.dtype)))
            if t in i_train:
                self._update_sh_degree()
                n_it = (self.cfg.first_frame_mapping_iters if t == 0
                        else self.cfg.mapping_iters)
                aux = self._map_frame(t, n_it, two_views=(t > 0))
                self.keyframes.append(t)
                if pending is not None:
                    self._drain_progressive_aux(*pending)
                pending = (t, aux)
                metrics.update({k: aux[k] for k in ("loss", "num_active")})
                terms = aux.get("loss_terms")
                if terms is not None:
                    metrics["rgb"], metrics["pear"], metrics["lp"] = \
                        terms[0], terms[1], terms[2]
                # device scalar, no sync; the -1 not-amortized sentinel is
                # filtered at print time
                metrics["inst"] = aux["num_instances_max"]
                if self.panel_fn is not None and t % self.panel_every == 0:
                    self._emit_panel(t)
            self.history.append({"stage": "progressive", "frame": t,
                                 **metrics})  # device scalars; converted
                                              # lazily by consumers
            if self.viewer is not None:
                timer.stop(sync_on=self.state.field.num_active)
                self._viewer_tick(timer.rays_per_sec)
            if t % 10 == 0:
                # the float() conversions force a device sync — only at
                # the logging cadence, not per frame
                h = self._health(self.field)
                self.log_fn(
                    f"[progressive {t}/{self.num_frames}] "
                    + " ".join(f"{k}={float(v):.4g}"
                               for k, v in metrics.items()
                               if not (k == "inst" and float(v) < 0))
                    + " | " + " ".join(f"{k}={float(v):.3g}"
                                       for k, v in h.items())
                    + f" ({time.time() - t0:.1f}s)")
                self._flush_history()
        if pending is not None:
            self._drain_progressive_aux(*pending)
        self._flush_history()

    def _drain_progressive_aux(self, frame: int, aux):
        """The deferred per-mapped-frame device-scalar reads (see
        progressive_run): slot-pool occupancy for capacity growth,
        instance overflow, and nonfinite-gradient attribution."""
        self._maybe_grow()
        self._check_overflow(aux)
        self._report_nonfinite(aux, f"frame {frame}")

    def global_run(self, iters: int | None = None):
        iters = iters if iters is not None else self.cfg.global_iters
        i_train = np.asarray(self.seq.i_train, np.int64)
        rng = self._global_rng
        w2c_all = jax.lax.stop_gradient(self.poses.all_w2c())
        from ..utils.profiling import StepTimer
        timer = StepTimer(self.cam.height, self.cam.width)
        done = 0
        # Persistent across chunked global_run calls (run_config34's
        # budget loop calls global_run(250) repeatedly): per-call `done`
        # can never reach the 5000-iteration validation/checkpoint
        # cadences, so cadence gates use this cross-call counter.
        total_before = getattr(self, "_global_done", 0)
        t0 = time.time()
        while done < iters:
            timer.start()
            self._update_sh_degree()
            n = min(self.global_chunk, iters - done)
            ts_np = rng.choice(i_train, size=n)
            if self.cfg.rebin_every > 1:
                # Group the chunk's random frame visits into runs of the
                # same frame so the binning-layout carry (BinState) pays
                # off in the global stage too (a frame change forces a
                # rebin). Each chunk still visits the same random
                # multiset of frames — only the within-chunk order
                # changes, turning i.i.d. sampling into a shuffled-epoch
                # style sweep; quality parity is covered by
                # tests/test_bin_reuse.py.
                ts_np = np.sort(ts_np)
            ts = jnp.asarray(ts_np, jnp.int32)
            kf_pad = jnp.zeros((self.num_frames,), jnp.int32)
            self.state, aux = self._mapping(
                self.state, self.colors, self.monodeps, w2c_all,
                ts, kf_pad, jnp.int32(1),
                cam=self.cam, cfg=self.cfg, two_views=False,
                sh_degree=self.active_sh_degree, densify_enabled=True,
                mesh=self.mesh)
            done += n
            self.cur_frame = int(ts[-1])
            self._maybe_grow()
            # every chunk, not just at the log cadence: chunked callers
            # (run_config34's budget loop calls global_run(250) repeatedly)
            # reset `done` each call, so a `done % 1000` gate can never
            # fire and instance overflow would go unmonitored for the
            # whole global stage (it did in the first 30k run). One
            # device-scalar read per chunk (~60 s of device work).
            self._check_overflow(aux)
            if self.viewer is not None:
                timer.stop(sync_on=self.state.field.num_active)
                self._viewer_tick(n * timer.rays_per_sec)
            total = total_before + done
            self._global_done = total
            if self.pose_ba_every and total % self.pose_ba_every < n:
                w2c_all = self._pose_ba_pass(total)
            if (self.checkpoint_dir
                    and total % self.checkpoint_every < n):
                self.save(f"{self.checkpoint_dir}/ckpt_{total:07d}")
            if total % 1000 < n:   # cross-call total, like the other
                                   # cadences: per-call `done` never
                                   # reaches 1000 under chunked callers
                terms = aux["loss_terms"]
                dt = {k: int(v) for k, v in aux["densify_totals"].items()
                      if float(v) > 0}
                self.log_fn(
                    f"[global {total}] loss={float(aux['loss']):.4f}"
                    f" rgb={float(terms[0]):.4f} pear={float(terms[1]):.4f}"
                    f" lp={float(terms[2]):.4f}"
                    f" active={int(aux['num_active'])}"
                    + (f" densify={dt}" if dt else "")
                    + f" ({time.time() - t0:.1f}s)")
                self._report_nonfinite(aux, f"global {total}")
            self.history.append({"stage": "global", "iter": done,
                                 "loss": float(aux["loss"]),
                                 "num_active": int(aux["num_active"])})
            # Mid-run validation cadence (reference evaluates the test
            # views every 5000 global iterations, train.py:401-425). This
            # is the alarm that catches quality regressions — e.g. an
            # active-count collapse — at iteration 5,000 instead of at the
            # end of a 30k run (round 3's 131k -> 59k collapse went
            # unnoticed for a full run without it).
            if (self.validation_every
                    and total % self.validation_every < n):
                val = self.validation()
                self.history.append({"stage": "global_val", "iter": total,
                                     **{k: v for k, v in val.items()
                                        if isinstance(v, (int, float))}})
            if total % 1000 < n:
                self._flush_history()
        self._flush_history()

    def _pose_ba_pass(self, total: int):
        """One global-stage pose-BA pass (see the pose_ba_every knob):
        photometrically refine every train-frame pose (except pinned
        frame 0) against the frozen map, in one jitted scan. Returns the
        refreshed stop-gradient w2c_all for subsequent mapping chunks."""
        from ..eval.pose_refine import make_jitted_refine_scan
        if not hasattr(self, "_refine_scan"):
            self._refine_scan = make_jitted_refine_scan()
        ts = jnp.asarray([t for t in self.seq.i_train if t != 0],
                         jnp.int32)
        q_all, t_all, losses_v = self._refine_scan(
            self.field, self.poses.quats, self.poses.trans, self.colors,
            ts, self.cam, iters=self.pose_ba_iters, lr=self.pose_ba_lr,
            sh_degree=self.active_sh_degree,
            impl=self.cfg.impl, max_instances=self.cfg.max_instances)
        self.poses = PoseTable(quats=q_all, trans=t_all)
        self.log_fn(f"[global {total}] pose-BA pass over {len(ts)} train "
                    f"frames: mean photometric loss "
                    f"{float(jnp.mean(losses_v)):.4f}")
        self.history.append({"stage": "pose_ba", "iter": total,
                             "mean_loss": float(jnp.mean(losses_v))})
        return jax.lax.stop_gradient(self.poses.all_w2c())

    # --------------------------------------------------------- evaluation
    def render_frame(self, t: int):
        f = self.field
        return render(f.means, f.quats, f.log_scales, f.logit_opacity,
                      f.sh, self.poses.w2c(t), self.cam, active=f.active,
                      sh_degree=self.active_sh_degree, impl=self.cfg.impl,
                      max_instances=self.cfg.max_instances)

    def validation(self, include_train: bool = False) -> dict:
        """Test-view PSNR/SSIM/LPIPS + pose metrics (reference
        ``train.py:446-515``). ``include_train`` additionally reports
        psnr_train over an every-8th subset of train views — a
        diagnostic that separates map quality from pose error (test
        frames' poses come from tracking only, never mapping)."""
        from ..eval.image_metrics import psnr, rgb_evaluation
        from ..eval.pose_metrics import evaluate_subsequences

        preds, gts = [], []
        for t in [int(i) for i in self.seq.i_test]:
            out = self.render_frame(t)
            preds.append(np.clip(np.asarray(out["render"]), 0, 1))
            gts.append(np.asarray(self.colors[t]))
            self._emit_panel(t, name="val")  # reference eval panels,
                                             # vis/visualizer.py:281-299
        metrics: dict = {}
        if preds:
            metrics.update(rgb_evaluation(np.stack(gts), np.stack(preds)))
        if include_train:
            tr_p, tr_g = [], []
            for t in [int(i) for i in self.seq.i_train][::8]:
                out = self.render_frame(t)
                tr_p.append(np.clip(np.asarray(out["render"]), 0, 1))
                tr_g.append(np.asarray(self.colors[t]))
            if tr_p:
                metrics["psnr_train"] = psnr(np.stack(tr_g),
                                             np.stack(tr_p))
        if getattr(self.seq, "gt_poses", None):
            pred_w2c = np.asarray(self.poses.all_w2c())
            metrics.update(evaluate_subsequences(
                pred_w2c, self.seq.gt_poses, self.seq.boundaries))
        self.log_fn("validation: " + " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
            if isinstance(v, (float, str))))
        return metrics

    # ------------------------------------------------------- persistence
    def save(self, path: str):
        from ..io.checkpoint import save_checkpoint
        save_checkpoint(path, self._ckpt_tree(self.capture()),
                        int(self.state.iteration), meta=self._shape_meta())

    def capture(self):
        return {"state": self.state, "poses": self.poses,
                "keyframes": np.asarray(self.keyframes, np.int64),
                "active_sh_degree": self.active_sh_degree}

    @staticmethod
    def _ckpt_tree(cap):
        """Checkpoint layout: the per-frame prediction caches (the bulk of
        a full-res checkpoint, ~1.3 GB at 60x1280x1024 — minutes through a
        remote-TPU tunnel) are stored bf16. They are rendered-depth/color
        CACHES consumed by the next tracking step and the panels; bf16
        costs ~3 decimal digits only on the first post-restore tracking
        step, after which live f32 renders repopulate them."""
        st = cap["state"]
        st = st._replace(pred_depths=st.pred_depths.astype(jnp.bfloat16),
                         pred_colors=st.pred_colors.astype(jnp.bfloat16))
        return {**cap, "state": st}

    def _shape_meta(self) -> dict:
        return {"capacity": self.field.capacity,
                "n_keyframes": len(self.keyframes),
                "sh_rest_k": int(self.field.sh_rest.shape[1]),
                "num_frames": self.num_frames,
                "max_instances": int(self.cfg.max_instances or 0),
                # crash-resume support: how far the global stage got
                "global_done": int(getattr(self, "_global_done", 0))}

    def _resize_capacity(self, new_cap: int):
        """Re-shape field + optimizer moments to ``new_cap`` slots (both
        directions; used to build a restore template matching a checkpoint
        saved after capacity growth)."""
        cap = self.field.capacity
        if new_cap == cap:
            return
        if new_cap > cap:
            field = grow_capacity(self.field, new_cap)

            def fit(x):
                if x.ndim == 0 or x.shape[0] != cap:
                    return x
                return jnp.pad(x, [(0, new_cap - cap)]
                               + [(0, 0)] * (x.ndim - 1))
        else:
            def shrink(x):
                if x.ndim == 0 or x.shape[0] != cap:
                    return x
                return x[:new_cap]
            field = jax.tree.map(shrink, self.field)
            fit = shrink
        opt = self.state.opt
        opt = opt.replace(mu=jax.tree.map(fit, opt.mu),
                          nu=jax.tree.map(fit, opt.nu))
        self.state = self.state._replace(field=field, opt=opt)

    def restore(self, path: str):
        """Restore a checkpoint — including into a FRESHLY CONSTRUCTED
        Trainer whose capacity / keyframe count differ from save time
        (the actual --run_start_checkpoint path; the shapes come from the
        checkpoint's metadata sidecar, reference ``train.py:106-113``)."""
        from ..io.checkpoint import load_checkpoint_meta, restore_checkpoint
        meta = load_checkpoint_meta(path)
        if meta is not None:
            assert meta["num_frames"] == self.num_frames, (
                f"checkpoint has {meta['num_frames']} frames, sequence has "
                f"{self.num_frames}: restoring into a different sequence")
            assert meta["sh_rest_k"] == self.field.sh_rest.shape[1], (
                "sh_degree mismatch between checkpoint and Trainer config")
            self._resize_capacity(meta["capacity"])
            self.keyframes = [0] * meta["n_keyframes"]
            self._global_done = int(meta.get("global_done", 0))
            if meta.get("max_instances"):
                # keep the grown instance buffer (avoids an immediate
                # overflow-triggered recompile after resume)
                if meta["max_instances"] != (self.cfg.max_instances or 0):
                    self.cfg = self.cfg._replace(
                        max_instances=meta["max_instances"])
                    self._mapping = make_jitted_mapping(self.cam, self.cfg,
                                            donate=True)
                    self._tracking = make_jitted_tracking(self.cam, self.cfg)
        restored, _ = restore_checkpoint(
            path, template=self._ckpt_tree(self.capture()))
        # caches live bf16 (which is also how checkpoints store them)
        restored["state"] = restored["state"]._replace(
            pred_depths=restored["state"].pred_depths.astype(jnp.bfloat16),
            pred_colors=restored["state"].pred_colors.astype(jnp.bfloat16))
        self.state = jax.tree.map(jnp.asarray, restored["state"])
        self.poses = jax.tree.map(jnp.asarray, restored["poses"])
        self.keyframes = [int(k) for k in restored["keyframes"]]
        self.active_sh_degree = int(restored["active_sh_degree"])
