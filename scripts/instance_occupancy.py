#!/usr/bin/env python
"""Per-frame effective instance counts from a training checkpoint.

Measures, for every frame pose in a saved run, how many duplicated
instances the binner would actually emit for the final field — the number
every binning pass scales with. Compares against the configured
``max_instances`` capacity (the auto-sized / overflow-grown buffer) to
quantify right-sizing headroom: binning cost is proportional to CAPACITY,
not occupancy, so a 2x oversized buffer doubles the binning stage for
nothing.

Runs on CPU (projection + counting only, no kernels).

Usage:
  python scripts/instance_occupancy.py --ckpt /tmp/cfg34_full_out/ckpt_final \
      --data /tmp/fullres [--frames 46]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default="/tmp/fullres")
    ap.add_argument("--frames", type=int, default=46)
    ap.add_argument("--bin_scale", type=int, default=2,
                    help="binning granularity / 16px (2 = production 32px)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from freesurgs_tpu.data.scared import load_scared
    from freesurgs_tpu.io.checkpoint import (load_checkpoint_meta,
                                             restore_checkpoint)
    from freesurgs_tpu.ops.projection import project_gaussians
    from freesurgs_tpu.ops.raster_pallas import effective_bin_tiles
    from freesurgs_tpu.train.loop import Trainer
    from freesurgs_tpu.train.steps import TrainConfig

    seq = load_scared(args.data, 0, args.frames, sample_rate=8)
    trainer = Trainer(seq, TrainConfig(max_instances=128), log_fn=print)
    trainer.restore(args.ckpt)
    f = trainer.field
    cam = trainer.cam
    meta = load_checkpoint_meta(args.ckpt) or {}
    cap_m = int(meta.get("max_instances", 0))

    @jax.jit
    def count(w2c):
        mean_cam = (w2c[:3, :3] @ f.means.T).T + w2c[:3, 3]
        proj = project_gaussians(mean_cam, jnp.exp(f.log_scales), f.quats,
                                 cam, active=f.active)
        opac = jax.nn.sigmoid(f.logit_opacity)
        return jnp.sum(effective_bin_tiles(proj, opac, args.bin_scale))

    counts = [int(count(trainer.poses.w2c(t)))
              for t in range(trainer.num_frames)]
    counts = np.asarray(counts)
    act = int(f.num_active)
    print(f"active gaussians {act}, capacity {f.capacity}, "
          f"max_instances (ckpt) {cap_m}")
    print(f"effective instances/frame: min {counts.min()} "
          f"mean {counts.mean():.0f} max {counts.max()} "
          f"(M/N at max: {counts.max() / max(act, 1):.2f})")
    if cap_m:
        print(f"capacity headroom at max: {cap_m / counts.max():.2f}x "
              f"(binning cost scales with capacity — >2x means the "
              f"buffer is costing real time)")


if __name__ == "__main__":
    main()
