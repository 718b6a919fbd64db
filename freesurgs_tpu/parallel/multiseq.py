"""Multi-sequence data-parallel training over the mesh's ``data`` axis.

BASELINE config 5's second half: N independent SCARED sequences trained
simultaneously, one per data shard — each shard holds its own Gaussian
field, pose table and video tensors, and runs the SAME jitted mapping
update locally; shard_map keeps every array sharded on the leading
``data`` axis so there is no cross-shard communication at all (the
embarrassingly-parallel axis), while the ``tiles`` axis inside each shard
remains available for band-sharded rendering on larger meshes.

On multi-host (jax.distributed), each host feeds its local shards'
sequences; arrays are created with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Camera
from ..train.steps import MappingState, TrainConfig, mapping_chunk
from .mesh import DATA_AXIS


def stack_states(states: list[MappingState]) -> MappingState:
    """Stack per-sequence training states along a leading data axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_states(mesh: Mesh, stacked: MappingState) -> MappingState:
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def unstack_states(stacked: MappingState, k: int) -> list[MappingState]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(k)]


def multiseq_mapping_chunk(mesh: Mesh, states: MappingState,
                           colors_all, monodeps_all, w2c_all, cur_ts,
                           cam: Camera, cfg: TrainConfig,
                           sh_degree: int = 0):
    """Run one mapping chunk on every sequence shard in parallel.

    All array arguments carry a leading ``data`` axis of size
    mesh.shape['data']; each shard executes the standard single-sequence
    ``mapping_chunk`` on its slice (single-view mode, densify enabled).
    Returns (states, aux) with the same leading axis.
    """

    def one_shard(state, colors, monodeps, w2c, ts):
        # shard_map keeps the sharded leading axis (size 1 per shard);
        # zero-size leaves are replicated (P()) and keep their full axis
        sq = lambda t: jax.tree.map(lambda x: x[0], t)  # noqa: E731
        state, colors, monodeps, w2c, ts = map(sq, (state, colors,
                                                    monodeps, w2c, ts))
        kf = jnp.zeros((colors.shape[0],), jnp.int32)
        st, aux = mapping_chunk(state, colors, monodeps, w2c, ts, kf,
                                jnp.int32(1), cam=cam, cfg=cfg,
                                two_views=False, sh_degree=sh_degree,
                                densify_enabled=True)
        def ex(t):
            return jax.tree.map(
                lambda x: jnp.asarray(x)[None]
                if jnp.asarray(x).size else
                jnp.broadcast_to(jnp.asarray(x)[None],
                                 (mesh.shape[DATA_AXIS],)
                                 + jnp.asarray(x).shape), t)
        return ex(st), ex(aux)

    d = P(DATA_AXIS)

    def spec_of(leaf):
        # XLA forces zero-size arrays (e.g. sh_rest at SH degree 0) to a
        # replicated sharding; declaring P(data) for them trips the
        # sharding-override check.
        return P() if leaf.size == 0 else d

    out_shapes = jax.eval_shape(one_shard, states, colors_all,
                                monodeps_all, w2c_all, cur_ts)
    out_specs = jax.tree.map(spec_of, out_shapes)
    in_specs = (jax.tree.map(spec_of, states),) + (d,) * 4
    return jax.shard_map(one_shard, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
        states, colors_all, monodeps_all, w2c_all, cur_ts)
