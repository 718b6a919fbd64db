import json

import numpy as np

from freesurgs_tpu.io.config import (Config, add_to_parser, from_args,
                                     load_config, save_config)
from freesurgs_tpu.utils import image as im


def test_config_cli_roundtrip(tmp_path):
    import argparse
    cfg = Config()
    parser = argparse.ArgumentParser()
    add_to_parser(cfg, parser)
    args = parser.parse_args([
        "--data_source_path", "/x", "--model_sh_degree", "2",
        "--run_test", "true", "--train_override", "tracking_iters=7",
        "--train_override", "w_rgb_mapping=3.5"])
    cfg = from_args(cfg, args)
    assert cfg.data.source_path == "/x"
    assert cfg.model.sh_degree == 2
    assert cfg.run.test is True
    tc = cfg.train_config()
    assert tc.tracking_iters == 7
    assert tc.w_rgb_mapping == 3.5

    path = str(tmp_path / "c.json")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg2.model.sh_degree == 2
    assert cfg2.train_config().tracking_iters == 7


def test_colorize_depth(rng):
    d = rng.uniform(1, 2, (16, 20)).astype(np.float32)
    img = im.colorize_depth(d)
    assert img.shape == (3, 16, 20)
    assert 0 <= img.min() and img.max() <= 1


def test_colorize_flow(rng):
    f = rng.normal(size=(2, 16, 20)).astype(np.float32)
    img = im.colorize_flow(f)
    assert img.shape == (3, 16, 20)
    assert np.isfinite(img).all()


def test_layout_ops(rng):
    a = rng.uniform(size=(3, 10, 12)).astype(np.float32)
    b = rng.uniform(size=(8, 15)).astype(np.float32)  # gray, other size
    h = im.hcat(a, b)
    assert h.shape[0] == 10 and h.shape[2] == 3
    v = im.vcat(a, b)
    assert v.shape[1] == 15 and v.shape[2] == 3
    bd = im.add_border(a, width=3)
    assert bd.shape == (16, 18, 3)
    lab = im.add_label(a, "GT rgb")
    assert lab.shape[0] > 10


def test_save_image(tmp_path, rng):
    a = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    p = str(tmp_path / "x.png")
    im.save_image(a, p)
    from PIL import Image
    assert Image.open(p).size == (8, 8)


def test_metrics_logger(tmp_path):
    from freesurgs_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(str(tmp_path))
    lg.log({"loss": 1.5}, step=3)
    lg.log({"psnr": 22.0})
    lg.close()
    lines = [json.loads(line) for line in
             open(str(tmp_path / "metrics.jsonl"))]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["psnr"] == 22.0
