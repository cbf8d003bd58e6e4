"""PASS 6: final shading — pixel = f(bestSample) * W, visibility forced on.

Reference: the shading loop in produceRestir
(pg/simpleguidx11.cpp:452-472): reservoirs with a sample shade
f(best) * W (with a shadow ray); empty reservoirs display the G-buffer
emission (lights, sky). Output is sanitized like every integrator result.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_restir import mathx
from tpu_restir.render.integrators.restir import gbuffer as gb_mod
from tpu_restir.render.integrators.restir import reservoir as rsv
from tpu_restir.render.integrators.restir.phat import evaluate_f


def shade_pass(scene, gb: gb_mod.GBuffer, res: rsv.Reservoir, cfg) -> jnp.ndarray:
    f_val = evaluate_f(res.sample, scene, gb, True, cfg.params,
                       cfg.intersector)
    pixel = jnp.where(res.has_sample()[..., None], f_val * res.w[..., None],
                      gb.emission)
    return mathx.sanitize(pixel)
