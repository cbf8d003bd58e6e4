"""Naive path tracer: BRDF sampling only, wavefront-style.

Reference: pg/NaivePathIntegrator.cpp:15-62 — a per-pixel recursion with
Russian roulette after bounce 5. The recursion is restructured as a fixed
bounce iteration over whole-image ray batches with active masks (SURVEY.md
§7 hard-part 5): at each bounce, the live wavefront intersects the scene,
adds emission/sky, then extends with one BSDF sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_restir import mathx, rng
from tpu_restir.render import brdf, camera as cam_mod, intersect
from tpu_restir.scene.envmap import sky_radiance
from tpu_restir.scene.materials import (apply_normal_map, apply_textures,
                                        gather_materials)


def render_naive(scene, cam, cfg, key) -> jnp.ndarray:
    """One 1-spp frame, (H, W, 3) radiance."""
    p = cfg.params
    o, d = cam_mod.generate_rays(cam, cfg.camera, key)
    shape = o.shape[:-1]

    radiance = jnp.zeros(shape + (3,))
    weight = jnp.ones(shape + (3,))
    active = jnp.ones(shape, bool)
    gi_key = rng.pass_key(key, rng.PASS_NAIVE)

    for bounce in range(p.max_bounce_count + 1):
        bkey = rng.draw_key(gi_key, bounce)
        hit = intersect.intersect_closest(
            scene, o, d, p.tnear_offset, jnp.inf, cfg.intersector)
        hi = intersect.hit_attributes(scene, o, d, hit)
        m = gather_materials(scene.materials, hi.mat_id)
        m = apply_textures(scene, m, hi.uv)
        hi = hi.replace(normal=apply_normal_map(scene, m, hi.normal,
                                                hi.tangent, hi.uv))

        # miss -> skybox / background (pg/NaivePathIntegrator.cpp:61)
        sky = sky_radiance(scene, p, d)
        miss = active & ~hi.did_hit
        radiance += jnp.where(miss[..., None], weight * sky, 0.0)
        active &= hi.did_hit

        # Russian roulette BEFORE the emitter check, as in the reference
        # (pg/NaivePathIntegrator.cpp:31-36): kill w.p. 1 - maxThroughput.
        max_tp = jnp.maximum(mathx.max_component(m.diffuse),
                             mathx.max_component(m.specular))
        do_rr = p.russian_roulette and bounce > p.rr_start_bounce
        if do_rr:
            u = jax.random.uniform(rng.draw_key(bkey, 1), shape)
            active &= max_tp > u

        # emitter hit terminates with its emission
        emissive = m.is_emissive()
        radiance += jnp.where((active & emissive)[..., None],
                              weight * m.emission, 0.0)
        active &= ~emissive

        if bounce == p.max_bounce_count:
            break

        # extend path with one BSDF sample
        s = brdf.sample_bsdf(rng.draw_key(bkey, 0), m, hi.normal, d,
                             hi.from_inside, hi.dst)
        cos_i = jnp.maximum(mathx.dot(s.omega_i, hi.normal), 0.0)
        # RR compensation divides the indirect term only
        # (pg/NaivePathIntegrator.cpp:55)
        denom = s.pdf * max_tp if do_rr else s.pdf
        contrib = jnp.where((denom > 0.0)[..., None],
                            s.f_r * (cos_i / jnp.maximum(denom, 1e-30))[..., None],
                            0.0)
        weight = weight * contrib
        active &= jnp.any(weight > 0.0, axis=-1)

        o = hi.point + hi.normal * p.normal_offset
        d = s.omega_i

    return mathx.sanitize(radiance)
