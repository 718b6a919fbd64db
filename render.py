#!/usr/bin/env python
"""Offline rendering: load a checkpoint and render train/test views.

Working equivalent of the reference's (broken) ``render.py``: renders every
requested frame to <model_path>/renders with GT comparisons and reports
PSNR/SSIM.

  python render.py --data_source_path <dir> --run_model_path <out> \
      --run_start_checkpoint <out>/ckpt_final [--split test|train|all]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    import numpy as np

    from freesurgs_tpu.data.scared import load_scared
    from freesurgs_tpu.eval.image_metrics import rgb_evaluation
    from freesurgs_tpu.io.cameras_json import save_cameras_json
    from freesurgs_tpu.io.config import Config, add_to_parser, from_args
    from freesurgs_tpu.train.loop import Trainer
    from freesurgs_tpu.utils.image import (add_label, colorize_depth, hcat,
                                           save_image)

    parser = argparse.ArgumentParser(description=__doc__)
    cfg = Config()
    add_to_parser(cfg, parser)
    parser.add_argument("--split", default="test",
                        choices=["test", "train", "all"])
    args = parser.parse_args(argv)
    cfg = from_args(cfg, args)

    seq = load_scared(cfg.data.source_path, cfg.data.frame_start,
                      cfg.data.frame_end, cfg.data.sample_rate)
    trainer = Trainer(seq, cfg.train_config(),
                      sh_degree_max=cfg.model.sh_degree,
                      capacity=cfg.model.capacity or None)
    assert cfg.run.start_checkpoint, "--run_start_checkpoint required"
    trainer.restore(cfg.run.start_checkpoint)

    out_dir = os.path.join(cfg.run.model_path, "renders")
    os.makedirs(out_dir, exist_ok=True)
    frames = {"test": seq.i_test, "train": seq.i_train,
              "all": range(seq.num_frames)}[args.split]

    preds, gts = [], []
    for t in [int(i) for i in frames]:
        out = trainer.render_frame(t)
        img = np.clip(np.asarray(out["render"]), 0, 1)
        gt = np.asarray(seq.colors[t])
        preds.append(img)
        gts.append(gt)
        panel = hcat(add_label(gt, "GT rgb"),
                     add_label(img, "Rendered rgb"),
                     add_label(colorize_depth(np.asarray(seq.monodeps[t])),
                               "prior depth"),
                     add_label(colorize_depth(
                         np.asarray(out["render_dep"])), "Rendered depth"))
        save_image(panel, os.path.join(out_dir, f"{args.split}_{t:04d}.png"))
    if preds:
        m = rgb_evaluation(np.stack(gts), np.stack(preds))
        print({k: round(v, 4) for k, v in m.items()})
    save_cameras_json(os.path.join(cfg.run.model_path, "cameras.json"),
                      np.asarray(trainer.poses.all_w2c()), seq.cam,
                      seq.image_names)
    return 0


if __name__ == "__main__":
    sys.exit(main())
