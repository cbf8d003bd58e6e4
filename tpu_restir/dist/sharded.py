"""Row-sharded ReSTIR rendering via shard_map + halo exchange.

The multi-chip execution model (SURVEY.md §5.8): pixel rows shard over a
1-D device mesh; the scene/BVH/light tables are replicated in HBM;
passes 1-3 and 6 are pure map; temporal/spatial reuse reads cross-border
pixels through ppermute halo exchange (tpu_restir.dist.halo). Because all
render randomness is PCG4D keyed by global pixel coordinates, the sharded
render is bit-identical to the single-chip render — asserted by
tests/test_sharding.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tpu_restir.render.integrators.restir.pipeline import (RestirState,
                                                           init_restir_state,
                                                           restir_step)

try:  # JAX >= 0.7 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _row_sharded_specs(tree, axis: str, full_h: int):
    """Spec pytree: leaves with a leading full-height row axis shard on
    `axis`; everything else (camera snapshot scalars) replicates."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[0] == full_h:
            return P(axis)
        return P()

    return jax.tree.map(spec, tree)


def make_sharded_restir_step(mesh: Mesh, cfg):
    """Build a jitted (scene, cam, frame_seed, state, frame_ctr) ->
    (frame, state) step that runs row-sharded over `mesh`."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    h, w = cfg.camera.height, cfg.camera.width
    if h % n_dev != 0:
        raise ValueError(f"height {h} not divisible by {n_dev} devices")

    state_tpl = init_restir_state(h, w)
    state_specs = _row_sharded_specs(state_tpl, axis, h)
    frame_spec = P(axis)

    def local_step(scene, cam, frame_seed, state, frame_ctr):
        return restir_step(scene, cam, cfg, frame_seed, state, frame_ctr,
                           axis_name=axis, n_devices=n_dev)

    sharded = _shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), state_specs, P()),
        out_specs=(frame_spec, state_specs),
        check_vma=False)

    return jax.jit(sharded)


def device_put_replicated(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def device_put_row_sharded(tree, mesh: Mesh, full_h: int):
    axis = mesh.axis_names[0]

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[0] == full_h:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)
