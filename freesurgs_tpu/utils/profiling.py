"""Profiling and debugging hooks.

The reference's observability is a pair of unused CUDA timing events plus a
rays/s counter (``train.py:50-51, 99, 267``) and
``torch.autograd.set_detect_anomaly`` (``train.py:601``). TPU-native
equivalents:

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard /
  xprof) around any training region;
- ``StepTimer``: wall-clock per-step timing + rays/s, robust to async
  dispatch (synchronizes on a provided array);
- ``enable_nan_debugging()``: jax_debug_nans — the anomaly-detection
  analogue (fails loudly at the op that produced a NaN).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA-executable cache for the entry points.

    Capacity growth / instance-buffer growth recompile every jitted step;
    through a tunneled TPU each recompile costs ~1-2 min, and a full-res
    progressive run sees a handful of them. The persistent cache makes
    reruns (and repeated shapes after growth) hit disk instead.
    FSTPU_COMPILE_CACHE overrides the location; set it empty to disable.
    """
    import os
    path = os.environ.get("FSTPU_COMPILE_CACHE",
                          path or "/tmp/fstpu_jax_cache")
    if not path:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs: run uncached


class StepTimer:
    """Per-step wall timing + rays/s (reference ``num_rays_per_step`` =
    H * W * 3, ``train.py:99``)."""

    def __init__(self, height: int, width: int):
        self.rays_per_step = height * width * 3
        self._t = None
        self.last_dt = float("nan")

    def start(self):
        self._t = time.time()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.last_dt = time.time() - self._t
        return self.last_dt

    @property
    def rays_per_sec(self) -> float:
        return self.rays_per_step / self.last_dt
