#!/usr/bin/env python
"""BASELINE configs 3-4 end-to-end run with a wall-clock budget.

Runs the reference schedule (progressive tracking+mapping per frame, then
the global refinement stage — reference ``train.py:318-443``) on the
full-res synthetic SCARED stand-in from scripts/make_fullres_dataset.py,
time-boxing the global stage so the run completes inside a bounded
session. The global stage runs in chunks and stops when the budget is
exhausted; the summary records the iterations actually completed, the
stage wall-clocks, and the final validation metrics (PSNR/SSIM/LPIPS +
sim(3)-aligned ATE/RPE, reference ``train.py:446-515``) as one JSON file
for BASELINE.md.

Usage:
  python scripts/run_config34.py --data /tmp/fullres --out /tmp/cfg34 \
      [--budget_s 1500] [--global_iters 6000] [--rebin_every 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/fullres")
    ap.add_argument("--out", default="/tmp/cfg34")
    ap.add_argument("--frames", type=int, default=46)
    ap.add_argument("--budget_s", type=float, default=1500.0,
                    help="total training wall-clock budget (progressive + "
                         "global); the global stage is cut to fit")
    ap.add_argument("--global_iters", type=int, default=6000)
    ap.add_argument("--global_chunk", type=int, default=250)
    ap.add_argument("--rebin_every", type=int, default=4)
    ap.add_argument("--rebin_tracking_every", type=int, default=1)
    ap.add_argument("--save_ckpt", action="store_true",
                    help="save the final checkpoint (large transfer "
                         "through a tunneled device)")
    ap.add_argument("--checkpoint_every", type=int, default=5000,
                    help="mid-global checkpoint cadence (crash resume; "
                         "0 disables)")
    ap.add_argument("--resume", default="",
                    help="checkpoint path to resume from: skips the "
                         "progressive stage and continues the global "
                         "stage at the checkpoint's iteration (the "
                         "recovery path for TPU-worker crashes)")
    ap.add_argument("--tracking_gn_iters", type=int, default=8,
                    help="Gauss-Newton flow-PnP iterations before the "
                         "photometric Adam tracking refinement "
                         "(train/flow_pnp.py); 0 = exact reference "
                         "tracking semantics (the GN=0 A/B arm)")
    ap.add_argument("--keyframe_policy", default="uniform",
                    choices=["uniform", "overlap"],
                    help="second-mapping-view selection: 'uniform' random "
                         "keyframe (reference train.py:236-244) or "
                         "'overlap' (the reference's defined-but-uncalled "
                         "viewpoint-overlap variant, "
                         "scene/pose_optimizer.py:534-577)")
    ap.add_argument("--pose_init", default="const_velocity",
                    choices=["const_velocity", "pnp"],
                    help="tracking pose init for frames t>1 (the "
                         "reference's initialize_pose pnp flag, "
                         "scene/pose_optimizer.py:498-532)")
    ap.add_argument("--pose_ba_every", type=int, default=0,
                    help="global-stage pose-BA cadence (net-new over the "
                         "reference; 0 = off): every N global iters, "
                         "photometrically refine train-frame poses "
                         "against the frozen map (monotone best-pose)")
    ap.add_argument("--pose_ba_iters", type=int, default=25)
    ap.add_argument("--pose_ba_lr", type=float, default=1e-3)
    ap.add_argument("--pose_ba_final", type=int, default=0,
                    help="AFTER the main summary is written: attempt N "
                         "monotone pose-BA passes against the final map, "
                         "re-validate, and write summary_ba.json. Crash-"
                         "safe ordering — the first full-scale MID-global "
                         "BA pass crashed the TPU worker (cfg34_r5b), so "
                         "the final-stage variant runs only once the main "
                         "record is on disk, with a right-sized instance "
                         "buffer, and any failure is caught and logged")
    ap.add_argument("--pose_ba_polish", type=int, default=0,
                    help="global mapping iterations run after each final "
                         "BA pass (lets the map adapt to the moved poses "
                         "before the re-validation)")
    ap.add_argument("--depth_prior", default="normalized",
                    choices=["normalized", "metric"],
                    help="depth-prior handling in the loader: 'normalized'"
                         " is reference parity (per-frame [0.5,1.5] affine"
                         " remap), 'metric' keeps 1/disparity as-is (for"
                         " metric depth sources; see data/scared.py)")
    ap.add_argument("--use_gt_poses", action="store_true",
                    help="DIAGNOSTIC: skip tracking and train the map at "
                         "ground-truth poses — isolates the map-quality "
                         "ceiling from tracked-pose error (the resulting "
                         "PSNR upper-bounds what perfect tracking could "
                         "reach; pose metrics become trivially zero)")
    args = ap.parse_args()

    from freesurgs_tpu.data.scared import load_scared
    from freesurgs_tpu.train.loop import Trainer
    from freesurgs_tpu.train.steps import TrainConfig
    from freesurgs_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.out, exist_ok=True)
    seq = load_scared(args.data, 0, args.frames, sample_rate=8,
                      depth_prior=args.depth_prior)
    print(f"loaded {seq.num_frames} frames {seq.cam.width}x{seq.cam.height},"
          f" {len(seq.i_train)} train / {len(seq.i_test)} test", flush=True)

    cfg = TrainConfig(global_iters=args.global_iters,
                      rebin_every=args.rebin_every,
                      rebin_tracking_every=args.rebin_tracking_every,
                      tracking_gn_iters=args.tracking_gn_iters,
                      keyframe_policy=args.keyframe_policy)
    from freesurgs_tpu.utils.logging import MetricsLogger
    trainer = Trainer(seq, cfg, global_chunk=args.global_chunk,
                      log_fn=lambda m: print(m, flush=True),
                      pose_init=args.pose_init,
                      pose_ba_every=args.pose_ba_every,
                      pose_ba_iters=args.pose_ba_iters,
                      pose_ba_lr=args.pose_ba_lr,
                      metrics_logger=MetricsLogger(args.out),
                      checkpoint_dir=(args.out if args.checkpoint_every
                                      else None),
                      checkpoint_every=args.checkpoint_every or 5000)

    if args.use_gt_poses:
        import jax.numpy as jnp
        import numpy as np_

        from freesurgs_tpu.core.transforms import rotmat_to_quat
        gt = np_.concatenate([np_.asarray(v)
                              for v in seq.gt_poses.values()])
        rel = gt @ np_.linalg.inv(gt[0])   # frame-0 frame == world frame
        quats = jnp.stack([rotmat_to_quat(jnp.asarray(m[:3, :3],
                                                      jnp.float32))
                           for m in rel])
        trainer.poses = trainer.poses.replace(
            quats=quats, trans=jnp.asarray(rel[:, :3, 3], jnp.float32))
        trainer.track_frame = lambda t: {}
        print("DIAGNOSTIC: ground-truth poses injected, tracking OFF",
              flush=True)

    summary = {"frames": args.frames,
               "use_gt_poses": bool(args.use_gt_poses),
               "tracking_gn_iters": args.tracking_gn_iters,
               "keyframe_policy": args.keyframe_policy,
               "pose_init": args.pose_init,
               "pose_ba_every": args.pose_ba_every,
               "depth_prior": args.depth_prior,
               "rebin_every": args.rebin_every,
               "rebin_tracking_every": args.rebin_tracking_every,
               "init_active": int(trainer.field.num_active),
               "capacity": int(trainer.field.capacity),
               "max_instances": int(trainer.cfg.max_instances)}

    t0 = time.time()
    if args.resume:
        import numpy as np_rng
        trainer.restore(args.resume)
        done0 = int(getattr(trainer, "_global_done", 0))
        # fresh stream offset by the resume point: the default stream
        # would replay the already-trained prefix's frame samples
        trainer._global_rng = np_rng.random.default_rng(
            trainer.seed + 1 + done0)
        summary["resumed_from"] = args.resume
        summary["resumed_at_global_iter"] = done0
        summary["progressive_s"] = 0.0
        print(f"resumed from {args.resume} at global iter {done0}",
              flush=True)
    else:
        trainer.progressive_run()
        done0 = 0
        summary["progressive_s"] = round(time.time() - t0, 1)
        print(f"progressive done in {summary['progressive_s']}s",
              flush=True)

    tg = time.time()
    done = done0
    while done < args.global_iters and time.time() - t0 < args.budget_s:
        n = min(args.global_chunk, args.global_iters - done)
        trainer.global_run(n)
        done += n
    summary["global_s"] = round(time.time() - tg, 1)
    summary["global_iters_done"] = done
    summary["final_active"] = int(trainer.field.num_active)
    summary["final_capacity"] = int(trainer.field.capacity)
    summary["final_max_instances"] = int(trainer.cfg.max_instances)
    print(f"global {done}/{args.global_iters} in {summary['global_s']}s",
          flush=True)

    if args.save_ckpt:
        trainer.save(os.path.join(args.out, "ckpt_final"))
        from freesurgs_tpu.io.cameras_json import save_cameras_json
        from freesurgs_tpu.io.ply import field_to_ply
        field_to_ply(trainer.field, os.path.join(args.out,
                                                 "point_cloud.ply"))
        import numpy as np_
        save_cameras_json(os.path.join(args.out, "cameras.json"),
                          np_.asarray(trainer.poses.all_w2c()), trainer.cam,
                          names=seq.image_names)

    tv = time.time()
    metrics = trainer.validation(include_train=True)
    summary["validation_s"] = round(time.time() - tv, 1)
    import numpy as np
    summary.update({k: (round(float(v), 5)
                        if isinstance(v, (float, np.floating)) else v)
                    for k, v in metrics.items()
                    if isinstance(v, (int, float, np.integer, np.floating,
                                      str))})
    summary["total_s"] = round(time.time() - t0, 1)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)

    if args.pose_ba_final:
        # Post-summary experiment: the main record above is already on
        # disk, so a TPU-worker crash here costs nothing but this stage.
        try:
            trainer.right_size_instances()
            tba = time.time()
            for k in range(args.pose_ba_final):
                trainer._pose_ba_pass(done + k)
                if args.pose_ba_polish:
                    trainer.global_run(args.pose_ba_polish)
                    done += args.pose_ba_polish
            mba = trainer.validation(include_train=True)
            sba = dict(summary)
            sba["pose_ba_final_passes"] = args.pose_ba_final
            sba["pose_ba_polish"] = args.pose_ba_polish
            sba["pose_ba_s"] = round(time.time() - tba, 1)
            sba.update({f"ba_{k}": (round(float(v), 5)
                                    if isinstance(v, (float, np.floating))
                                    else v)
                        for k, v in mba.items()
                        if isinstance(v, (int, float, np.integer,
                                          np.floating, str))})
            with open(os.path.join(args.out, "summary_ba.json"), "w") as f:
                json.dump(sba, f, indent=1)
            print(json.dumps(sba), flush=True)
        except Exception as e:  # noqa: BLE001 — worker crashes land here
            print(f"pose-BA final stage failed (main summary already "
                  f"recorded): {e!r}", flush=True)


if __name__ == "__main__":
    main()
