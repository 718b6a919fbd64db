"""Structured training logs: rich console + JSONL metrics.

Replaces the reference's wandb backbone (``train.py:275-280, 427-432``) and
rich ``Log`` helper (``utils/logging_utils.py``) with a dependency-light
pair: styled console output when ``rich`` is present, and an append-only
``metrics.jsonl`` any dashboard can tail. A wandb sink attaches
automatically when the package + login exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False,
                 run_name: str = "free-surgs-tpu"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project="3DGS", name=run_name)
            except Exception:
                self._wandb = None
        try:
            from rich.console import Console
            self._console = Console()
        except ImportError:
            self._console = None

    def log(self, metrics: dict[str, Any], step: int | None = None,
            echo: bool = False):
        rec = {"t": round(time.time() - self._t0, 3)}
        if step is not None:
            rec["step"] = step
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if echo:
            self.info(" ".join(f"{k}={v}" for k, v in rec.items()))

    def log_image(self, name: str, img, step: int | None = None):
        """Save a (H, W, 3) float panel under ``out_dir/panels/`` and
        forward to wandb when attached (the reference's training-time
        image comparison panels, ``train.py:349-365``)."""
        from .image import save_image
        d = os.path.join(os.path.dirname(self.path), "panels")
        os.makedirs(d, exist_ok=True)
        suffix = f"_{step:07d}" if step is not None else ""
        save_image(img, os.path.join(d, f"{name}{suffix}.png"))
        if self._wandb is not None:
            import wandb
            self._wandb.log({name: wandb.Image(img)}, step=step)

    def info(self, msg: str):
        if self._console is not None:
            self._console.log(msg)
        else:
            print(msg, flush=True)

    def close(self):
        self._f.close()
