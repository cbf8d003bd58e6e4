"""Target-function evaluation: f and p_hat.

Reference: ReSTIRIntegrator::evaluateF / evaluatePHat
(pg/ReSTIRIntegrator.cpp:180-211). f = L_i * f_r * G * V for a light
sample against a G-buffer surface; p_hat = |f|. Every call is an
image-shaped batch; when test_visibility is set the V term is one batched
occlusion query.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_restir import mathx
from tpu_restir.render import brdf, intersect
from tpu_restir.render.integrators.restir.gbuffer import GBuffer
from tpu_restir.render.integrators.restir.reservoir import LightSample


def evaluate_f(sample: LightSample, scene, gb: GBuffer, test_visibility,
               params, intersector) -> jnp.ndarray:
    """f(sample; surface) with optional visibility (pg/ReSTIRIntegrator.cpp:185-211).

    Invalid samples and emissive surfaces evaluate to 0 (lights are
    displayed directly, :188)."""
    ok = sample.valid & ~gb.is_emissive()
    seg = sample.point - gb.pos
    r_sqr = mathx.dot(seg, seg)
    wi = mathx.normalize(seg)
    cos_i = jnp.maximum(mathx.dot(wi, gb.normal), 0.0)
    cos_y = jnp.abs(mathx.dot(-wi, sample.normal))
    g = jnp.where(r_sqr > 0.0, cos_i * cos_y / jnp.maximum(r_sqr, 1e-20), 0.0)
    f_r = brdf.gbuf_eval_brdf(gb, wi)
    f = sample.l_i * f_r * g[..., None]
    if test_visibility:
        occ = intersect.test_occlusion(scene, gb.pos, sample.point, params,
                                       intersector)
        ok = ok & ~occ
    return jnp.where(ok[..., None], f, 0.0)


def evaluate_p_hat(sample: LightSample, scene, gb: GBuffer, test_visibility,
                   params, intersector) -> jnp.ndarray:
    """p_hat = |f| (pg/ReSTIRIntegrator.cpp:180-183)."""
    return mathx.length(
        evaluate_f(sample, scene, gb, test_visibility, params, intersector))
