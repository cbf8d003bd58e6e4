"""Sharded differentiable rendering: psum'd parameter gradients.

The BASELINE north star (SURVEY.md §5.8, bullet 4): material-parameter
gradients all-reduced across the device mesh, overlapping the backward
pass. Pixel rows shard over the mesh; material params are replicated
(in_spec P()), so reverse-mode AD through shard_map inserts exactly the
psum-of-gradients all-reduce — XLA's latency-hiding scheduler overlaps it
with the remaining backward work. The per-device loss partial is psum'd
in the forward pass so the scalar loss is replicated-consistent.

Parity oracle: tests/test_sharded_diff.py asserts sharded value+grads ==
single-chip value+grads on the virtual 8-device CPU mesh (all render
randomness is PCG4D keyed by global pixel coords, so frames are
bit-identical; only the loss-reduction order differs).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tpu_restir import rng
from tpu_restir.diff.params import apply_params
from tpu_restir.render.integrators.restir.pipeline import (init_restir_state,
                                                           restir_step)

try:  # JAX >= 0.7
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_sharded_value_and_grad(scene, cam, cfg, seeds: Sequence[int],
                                target, mesh: Mesh):
    """Build a jitted params -> (loss, grads) over a row-sharded mesh.

    Same estimator as diff.render.loss_fn (mean squared pixel error of the
    average of `seeds` ReSTIR frames, temporal state detached between
    frames), distributed over `mesh`.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    h, w = cfg.camera.height, cfg.camera.width
    if h % n_dev != 0:
        raise ValueError(f"height {h} not divisible by {n_dev} devices")
    local_h = h // n_dev
    seeds = tuple(seeds)

    def local_loss(params: Dict, scene_in, cam_in, target_loc):
        scene_p = apply_params(scene_in, params)
        state = init_restir_state(local_h, w)
        acc = jnp.zeros((local_h, w, 3))
        for i, s in enumerate(seeds):
            frame, state = restir_step(
                scene_p, cam_in, cfg, rng.make_frame_seed(cfg.seed, s),
                state, jnp.asarray(s), axis_name=axis, n_devices=n_dev)
            state = jax.lax.stop_gradient(state)
            acc = acc + (frame - acc) / (i + 1.0)
        sq = jnp.sum((acc - target_loc) ** 2)
        return jax.lax.psum(sq, axis) / (h * w * 3)

    sharded = _shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)), out_specs=P(),
        check_vma=False)

    scene_r = jax.device_put(scene, NamedSharding(mesh, P()))
    cam_r = jax.device_put(cam, NamedSharding(mesh, P()))
    target_s = jax.device_put(target, NamedSharding(mesh, P(axis)))

    return jax.jit(jax.value_and_grad(
        lambda p: sharded(p, scene_r, cam_r, target_s)))
