#!/usr/bin/env python
"""Evaluate a saved checkpoint: test/train PSNR, pose metrics, and the
pose-refined test PSNR that separates map quality from tracked-pose error.

Raw test-view PSNR convolves two error sources: the map itself and the
TEST pose (test frames' poses come from tracking only — mapping never
optimizes them, reference ``train.py:446-489``). ``--refine_iters N``
additionally reports metrics after photometric pose-only refinement of
each test view against the FROZEN map (eval/pose_refine.py) — the
standard eval-time alignment for SfM-free pipelines; the map is not
updated, so the refined number isolates reconstruction quality.

Usage:
  python scripts/eval_ckpt.py --ckpt /tmp/cfg34_full/ckpt_final \
      --data /tmp/fullres [--frames 46] [--refine_iters 100]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default="/tmp/fullres")
    ap.add_argument("--frames", type=int, default=46)
    ap.add_argument("--refine_iters", type=int, default=100)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from freesurgs_tpu.data.scared import load_scared
    from freesurgs_tpu.eval.image_metrics import psnr
    from freesurgs_tpu.train.loop import Trainer
    from freesurgs_tpu.train.steps import TrainConfig
    from freesurgs_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    seq = load_scared(args.data, 0, args.frames, sample_rate=8)
    trainer = Trainer(seq, TrainConfig(max_instances=128),
                      log_fn=lambda m: print(m, flush=True))
    trainer.restore(args.ckpt)
    metrics = trainer.validation(include_train=True)
    out = {k: round(float(v), 5) if isinstance(v, (float, np.floating))
           else v for k, v in metrics.items()
           if isinstance(v, (int, float, str, np.floating, np.integer))}

    if args.refine_iters > 0:
        from freesurgs_tpu.eval.pose_refine import make_jitted_refine
        refine = make_jitted_refine()
        ps = []
        for t in [int(i) for i in seq.i_test]:
            q, tr_, loss = refine(
                trainer.field, trainer.poses.quats[t],
                trainer.poses.trans[t], trainer.colors[t], trainer.cam,
                iters=args.refine_iters, sh_degree=trainer.active_sh_degree,
                impl=trainer.cfg.impl,
                max_instances=trainer.cfg.max_instances)
            trainer.poses = trainer.poses.set_frame(t, q, tr_)
            o = trainer.render_frame(t)
            p = psnr(np.asarray(trainer.colors[t])[None],
                     np.clip(np.asarray(o["render"]), 0, 1)[None])
            ps.append(float(p))
            print(f"refined test frame {t}: psnr {p:.2f}", flush=True)
        out["psnr_test_pose_refined"] = round(float(np.mean(ps)), 5)
        out["refine_iters"] = args.refine_iters

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
