"""Differentiable rendering: loss + gradients w.r.t. material parameters.

BASELINE.json config 4: differentiable albedo/roughness/emission
optimization against a target image, with gradients validated against
finite differences (tests/test_diff.py). The estimator uses fixed frame
seeds (common random numbers) so render(params) is a deterministic,
almost-everywhere-differentiable function of the parameters.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from tpu_restir import rng
from tpu_restir.diff.params import apply_params
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.restir.pipeline import (
    init_restir_state, restir_step)


def render_with_params(params: Dict, scene, cam, cfg, seeds: Sequence[int]):
    """Average of frames rendered with the given frame seeds, as a
    differentiable function of material/texture params. cfg.integrator
    selects the pipeline: ReSTIR (temporal state carried but detached —
    the estimator differentiates each frame's shading; reuse history is
    treated as data) or the naive/NEE wavefront path tracers (where the
    full material set, including MaterialTS roughness, is live)."""
    scene_p = apply_params(scene, params)
    h, w = cfg.camera.height, cfg.camera.width
    if cfg.integrator in ("naive", "nee"):
        from tpu_restir.render.integrators import render_naive, render_nee

        fn = render_naive if cfg.integrator == "naive" else render_nee
        acc = jnp.zeros((h, w, 3))
        for i, s in enumerate(seeds):
            frame = fn(scene_p, cam, cfg, rng.frame_key(cfg.seed, s))
            acc = acc + (frame - acc) / (i + 1.0)
        return acc
    state = init_restir_state(h, w)
    acc = jnp.zeros((h, w, 3))
    for i, s in enumerate(seeds):
        frame, state = restir_step(scene_p, cam, cfg,
                                   rng.make_frame_seed(cfg.seed, s), state,
                                   jnp.asarray(s))
        state = jax.lax.stop_gradient(state)
        acc = acc + (frame - acc) / (i + 1.0)
    return acc


def loss_fn(params: Dict, scene, cam, cfg, seeds, target):
    img = render_with_params(params, scene, cam, cfg, seeds)
    return jnp.mean((img - target) ** 2)


def make_value_and_grad(scene, cam, cfg, seeds, target):
    f = partial(loss_fn, scene=scene, cam=cam, cfg=cfg, seeds=tuple(seeds),
                target=target)
    return jax.jit(jax.value_and_grad(lambda p: f(p)))
