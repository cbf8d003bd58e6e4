"""Inverse-rendering loop: fit material parameters to a target image.

BASELINE.json config 4 ("textured glossy scene, differentiable
albedo/roughness/emission optimization vs target image"). Adam over the
parameter pytree; each step renders with fresh frame seeds so the
stochastic gradients decorrelate across steps.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import optax

from tpu_restir.diff.params import extract_params
from tpu_restir.diff.render import loss_fn


def optimize_materials(scene, cam, cfg, target, *,
                       fields: Sequence[str] = ("diffuse",),
                       n_steps: int = 100, lr: float = 5e-2,
                       frames_per_step: int = 1, seed0: int = 1000,
                       verbose: bool = False):
    """Returns (optimized params, loss history)."""
    params: Dict = extract_params(scene, fields)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, seeds):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, cam, cfg,
                                                  seeds, target)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for i in range(n_steps):
        seeds = tuple(seed0 + i * frames_per_step + j
                      for j in range(frames_per_step))
        params, opt_state, loss = step(params, opt_state, seeds)
        history.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"step {i:4d} loss {history[-1]:.6f}")
    return params, history
