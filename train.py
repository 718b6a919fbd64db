#!/usr/bin/env python
"""CLI entry point: SfM-free Gaussian-splatting training on TPU.

Equivalent of the reference's ``train.py`` __main__ (``train.py:547-605``):
  python train.py --data_source_path <dir> --run_model_path <out>
  python train.py ... --run_test true          # evaluation only
  python train.py ... --run_start_checkpoint <ckpt-dir>

The flag surface is generated from the typed Config tree (io/config.py);
per-field TrainConfig overrides go through --train_override k=v.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    from freesurgs_tpu.io.config import (Config, add_to_parser, from_args,
                                         save_config)

    parser = argparse.ArgumentParser(description=__doc__)
    cfg = Config()
    add_to_parser(cfg, parser)
    args = parser.parse_args(argv)
    cfg = from_args(cfg, args)

    if cfg.run.platform:
        import jax
        jax.config.update("jax_platforms", cfg.run.platform)

    from freesurgs_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    if cfg.run.debug_nans:
        from freesurgs_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()

    os.makedirs(cfg.run.model_path, exist_ok=True)
    save_config(cfg, os.path.join(cfg.run.model_path, "config.json"))

    from freesurgs_tpu.data.scared import load_scared
    from freesurgs_tpu.train.loop import Trainer
    from freesurgs_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(cfg.run.model_path)
    seq = load_scared(cfg.data.source_path, cfg.data.frame_start,
                      cfg.data.frame_end, cfg.data.sample_rate,
                      depth_prior=cfg.data.depth_prior)
    logger.info(f"loaded {seq.num_frames} frames "
                f"{seq.cam.width}x{seq.cam.height}, "
                f"{len(seq.i_train)} train / {len(seq.i_test)} test")

    trainer = Trainer(
        seq, cfg.train_config(), sh_degree_max=cfg.model.sh_degree,
        global_chunk=cfg.run.global_chunk,
        init_mask_frac=cfg.model.init_mask_frac,
        capacity=cfg.model.capacity or None, seed=cfg.run.seed,
        log_fn=logger.info, checkpoint_dir=cfg.run.model_path,
        checkpoint_every=cfg.run.checkpoint_every,
        panel_fn=logger.log_image)

    if cfg.run.visualize:
        from freesurgs_tpu.viz.viewer import GSViewer
        viewer = GSViewer.create(
            cfg.run.port, lambda: trainer.field,
            lambda: trainer.poses.w2c(trainer.cur_frame), seq.cam,
            impl=cfg.run.impl or None,
            max_instances=cfg.run.max_instances,
            get_frame_pose=lambda t: trainer.poses.w2c(t),
            num_frames=seq.num_frames,
            export_dir=os.path.join(cfg.run.model_path, "render_path"))
        if viewer is None:
            logger.info("viser not installed; running headless")
        trainer.viewer = viewer

    if cfg.run.start_checkpoint:
        ckpt = cfg.run.start_checkpoint
        if ckpt == "latest":   # reference load_iteration=-1 semantics
            from freesurgs_tpu.io.checkpoint import latest_checkpoint
            ckpt = latest_checkpoint(cfg.run.model_path)
            if ckpt is None:
                logger.info(f"no checkpoint under {cfg.run.model_path}")
                return 1
        trainer.restore(ckpt)
        logger.info(f"restored {ckpt} at iteration "
                    f"{int(trainer.state.iteration)}")

    if cfg.run.test:
        metrics = trainer.validation()
        logger.log(metrics)
        return 0

    if not cfg.run.start_checkpoint:
        trainer.progressive_run()
        trainer.save(os.path.join(cfg.run.model_path, "ckpt_progressive"))
    trainer.global_run()
    trainer.save(os.path.join(cfg.run.model_path, "ckpt_final"))

    from freesurgs_tpu.io.ply import field_to_ply
    field_to_ply(trainer.field,
                 os.path.join(cfg.run.model_path, "point_cloud.ply"))

    metrics = trainer.validation()
    logger.log(metrics)
    logger.info("all complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
