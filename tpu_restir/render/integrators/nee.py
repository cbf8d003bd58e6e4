"""NEE path tracer: split direct/indirect with pluggable DI strategy.

Reference: pg/NEEPathIntegrator.cpp:55-132. The wavefront form tracks the
last path-vertex type so emitter hits only count when arriving from a
camera or mirror vertex (double-count avoidance, :93-97); direct lighting
at each bounce is delegated to tpu_restir.render.integrators.direct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_restir import mathx, rng
from tpu_restir.render import brdf, camera as cam_mod, intersect
from tpu_restir.render.integrators.direct import calculate_direct
from tpu_restir.scene.envmap import sky_radiance
from tpu_restir.scene.materials import (VertexType, apply_normal_map,
                                        apply_textures, gather_materials)


def render_nee(scene, cam, cfg, key) -> jnp.ndarray:
    """One 1-spp frame, (H, W, 3) radiance."""
    p = cfg.params
    o, d = cam_mod.generate_rays(cam, cfg.camera, key)
    shape = o.shape[:-1]

    radiance = jnp.zeros(shape + (3,))
    weight = jnp.ones(shape + (3,))
    active = jnp.ones(shape, bool)
    last_vtype = jnp.full(shape, VertexType.CAMERA, jnp.int32)
    di_key = rng.pass_key(key, rng.PASS_NEE_DIRECT)
    gi_key = rng.pass_key(key, rng.PASS_NEE_GI)

    for bounce in range(p.max_bounce_count + 1):
        hit = intersect.intersect_closest(
            scene, o, d, p.tnear_offset, jnp.inf, cfg.intersector)
        hi = intersect.hit_attributes(scene, o, d, hit)
        m = gather_materials(scene.materials, hi.mat_id)
        m = apply_textures(scene, m, hi.uv)
        hi = hi.replace(normal=apply_normal_map(scene, m, hi.normal,
                                                hi.tangent, hi.uv))

        sky = sky_radiance(scene, p, d)
        miss = active & ~hi.did_hit
        radiance += jnp.where(miss[..., None], weight * sky, 0.0)
        active &= hi.did_hit

        max_tp = jnp.maximum(mathx.max_component(m.diffuse),
                             mathx.max_component(m.specular))
        do_rr = p.russian_roulette and bounce > p.rr_start_bounce
        if do_rr:
            u = jax.random.uniform(rng.draw_key(gi_key, 100 + bounce), shape)
            active &= max_tp > u

        # emitter hits count only from camera/mirror vertices
        emissive = m.is_emissive()
        count_emit = (last_vtype == VertexType.CAMERA) \
            | (last_vtype == VertexType.MIRROR)
        radiance += jnp.where((active & emissive & count_emit)[..., None],
                              weight * m.emission, 0.0)
        active &= ~emissive

        # direct lighting at this vertex (pg/NEEPathIntegrator.cpp:100-103)
        if cfg.nee_calc_di:
            di = calculate_direct(
                cfg.direct_strategy, rng.draw_key(di_key, bounce), scene, p,
                cfg, hi.point, hi.normal, m, d, hi.from_inside, hi.dst)
            di = mathx.sanitize(di)
            radiance += jnp.where(active[..., None], weight * di, 0.0)

        if bounce == p.max_bounce_count or not cfg.nee_calc_gi:
            break

        s = brdf.sample_bsdf(rng.draw_key(gi_key, bounce), m, hi.normal, d,
                             hi.from_inside, hi.dst)
        # NEE uses |cos| so refractive continuation works
        # (pg/NEEPathIntegrator.cpp:119)
        cos_i = jnp.abs(mathx.dot(s.omega_i, hi.normal))
        denom = s.pdf * max_tp if do_rr else s.pdf
        contrib = jnp.where((denom > 0.0)[..., None],
                            s.f_r * (cos_i / jnp.maximum(denom, 1e-30))[..., None],
                            0.0)
        contrib = mathx.sanitize(contrib)
        weight = weight * contrib
        active &= jnp.any(weight > 0.0, axis=-1)
        last_vtype = jnp.where(active, s.vtype, last_vtype)

        o = hi.point + hi.normal * p.normal_offset
        d = s.omega_i

    return mathx.sanitize(radiance)
