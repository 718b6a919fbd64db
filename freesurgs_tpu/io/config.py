"""Unified typed configuration + CLI reflection.

Replaces the reference's three argparse ParamGroups plus its many
hard-coded hyperparameters (``arguments/__init__.py`` + ``train.py:58-102``)
with one dataclass tree; ``add_to_parser`` / ``from_args`` auto-generate
CLI flags from the fields (the same reflection idea as the reference's
``ParamGroup``, typed). Configs serialize to JSON next to checkpoints
(replacing the reference's eval()'d ``cfg_args`` file,
``arguments/__init__.py:134-154``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field

from ..train.densify import DensifyConfig
from ..train.steps import TrainConfig


@dataclass
class DataConfig:
    source_path: str = ""
    data_type: str = "scared"
    frame_start: int = 0
    frame_end: int = -1
    sample_rate: int = 8          # test split stride
    depth_prior: str = "normalized"  # or "metric" (see data/scared.py)


@dataclass
class ModelConfig:
    sh_degree: int = 3
    capacity: int = 0             # 0 -> auto from init point count
    init_mask_frac: float = 0.1   # first-frame pixel subsample


@dataclass
class RunConfig:
    model_path: str = "./output/run"
    seed: int = 6666
    test: bool = False
    start_checkpoint: str = ""
    visualize: bool = False
    port: int = 6009
    log_metrics: bool = True
    global_chunk: int = 100
    checkpoint_every: int = 5000  # global-stage periodic-save cadence
                                  # (a full-res save moves ~1.3 GB of
                                  # prediction caches through the device
                                  # tunnel — minutes per save; raise this
                                  # for long remote-TPU runs)
    impl: str = ""                # '' -> auto (pallas on TPU)
    max_instances: int = 0        # 0 -> auto-size from frame-0 coverage
    debug_nans: bool = False      # jax_debug_nans (detect_anomaly analogue)
    platform: str = ""            # force a jax platform ('cpu' for local
                                  # verification while the TPU is busy —
                                  # the container's JAX_PLATFORMS pin
                                  # overrides env vars, so this goes
                                  # through jax.config)


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    run: RunConfig = field(default_factory=RunConfig)
    # TrainConfig is a NamedTuple (jit-static); store overrides as dict
    train_overrides: dict = field(default_factory=dict)

    def train_config(self) -> TrainConfig:
        kw = dict(self.train_overrides)
        kw.setdefault("impl", self.run.impl or None)
        kw.setdefault("max_instances", self.run.max_instances)
        if "densify" in kw and isinstance(kw["densify"], dict):
            kw["densify"] = DensifyConfig(**kw["densify"])
        return TrainConfig(**kw)


def _iter_fields(cfg, prefix=""):
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            yield from _iter_fields(v, prefix + f.name + ".")
        elif isinstance(v, (int, float, str, bool)):
            yield prefix + f.name, f.type, v, cfg, f.name


def add_to_parser(cfg: Config, parser: argparse.ArgumentParser):
    for path, ftype, default, _, _ in _iter_fields(cfg):
        flag = "--" + path.replace(".", "_")
        if isinstance(default, bool):
            parser.add_argument(flag, type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=default)
        else:
            parser.add_argument(flag, type=type(default), default=default)
    parser.add_argument("--train_override", action="append", default=[],
                        help="k=v override for TrainConfig fields")
    return parser


def from_args(cfg: Config, args: argparse.Namespace) -> Config:
    for path, _, _, owner, name in _iter_fields(cfg):
        setattr(owner, name, getattr(args, path.replace(".", "_")))
    for kv in args.train_override:
        k, v = kv.split("=", 1)
        proto = TrainConfig()._asdict()
        if k not in proto:
            raise KeyError(f"unknown TrainConfig field {k}")
        if proto[k] is None or isinstance(proto[k], str):
            # str-typed fields (including optional ones whose default is
            # None, e.g. impl): take the raw string
            cfg.train_overrides[k] = v
        else:
            cfg.train_overrides[k] = type(proto[k])(json.loads(v))
    return cfg


def save_config(cfg: Config, path: str):
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)


def load_config(path: str) -> Config:
    with open(path) as f:
        d = json.load(f)
    return Config(data=DataConfig(**d["data"]), model=ModelConfig(**d["model"]),
                  run=RunConfig(**d["run"]),
                  train_overrides=d.get("train_overrides", {}))
