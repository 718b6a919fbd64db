"""Device mesh helpers.

The reference has no distributed path at all (SURVEY.md section 2.4); this
is net-new TPU design: a 1-D mesh whose single axis shards IMAGE TILE ROWS
for the compositing stage (the pixel-parallel axis), with Gaussian
parameters replicated and their gradients all-reduced by XLA through the
shard_map transpose. Multi-host extends the same axis over
jax.distributed-initialized processes; the data-parallel multi-sequence
axis composes on top (see ``parallel/sharded.py``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

TILE_AXIS = "tiles"
DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, data_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % data_parallel == 0
    arr = np.array(devs[:n]).reshape(data_parallel, n // data_parallel)
    return Mesh(arr, (DATA_AXIS, TILE_AXIS))


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """jax.distributed bootstrap for real multi-host runs (no-op when env
    vars are absent — single-host dev path)."""
    import os
    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return jax.process_count(), jax.process_index()
