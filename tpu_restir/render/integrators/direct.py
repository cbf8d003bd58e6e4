"""Direct-lighting strategies for the NEE integrator.

Counterparts of DirectAreaIntegrator / DirectBRDFIntegrator /
DirectMISIntegrator (pg/DirectAreaIntegrator.cpp:9-53,
pg/DirectBRDFIntegrator.cpp:7-49, pg/DirectMISIntegrator.cpp:10-144) plus
a working per-pixel RIS strategy (the reference's
DirectReservoirIntegrator is gutted/commented out — SURVEY.md §2.4; this
implementation provides the capability properly).

All functions take the flattened hit wavefront: positions/normals of
shading points, per-ray material columns `m`, incident dirs `d`, and
return the direct radiance (..., 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_restir import mathx, rng
from tpu_restir.config import DirectStrategy
from tpu_restir.render import brdf, intersect
from tpu_restir.scene import lights as lights_mod
from tpu_restir.scene.materials import gather_materials


def _light_sample_geometry(point, l_point, l_normal):
    """Common geometry terms toward a light sample."""
    seg = l_point - point
    r_sqr = mathx.dot(seg, seg)
    wi = mathx.normalize(seg)
    cos_y = jnp.maximum(mathx.dot(-wi, l_normal), 0.0)
    return wi, r_sqr, cos_y


def direct_area(key, scene, p, cfg, point, normal, m, d):
    """One area-CDF light sample with geometry term + shadow ray
    (pg/DirectAreaIntegrator.cpp:9-53)."""
    if not scene.lights.is_valid:
        return jnp.zeros_like(point)
    shape = point.shape[:-1]
    ls = lights_mod.sample_light_point(key, scene, shape)
    wi, r_sqr, cos_y = _light_sample_geometry(point, ls["point"], ls["normal"])
    cos_i = jnp.maximum(mathx.dot(wi, normal), 0.0)
    facing = (cos_i > 0.0) & (cos_y > 0.0) & (r_sqr > 0.0)
    occ = intersect.test_occlusion(scene, point, ls["point"], p,
                                   cfg.intersector)
    g = jnp.where(r_sqr > 0.0, cos_i * cos_y / jnp.maximum(r_sqr, 1e-20), 0.0)
    f_r = brdf.eval_bsdf(m, normal, d, wi)
    contrib = ls["l_i"] * f_r * (g / jnp.maximum(ls["pdf_area"], 1e-20))[..., None]
    return jnp.where((facing & ~occ)[..., None], contrib, 0.0)


def _trace_brdf_sample(key, scene, p, cfg, point, normal, m, d,
                       from_inside, dst):
    """Sample the BSDF and trace toward it; returns the bounced-hit info
    needed by the BRDF-side estimators."""
    s = brdf.sample_bsdf(key, m, normal, d, from_inside, dst)
    o2 = point + p.normal_offset * normal
    hit = intersect.intersect_closest(scene, o2, s.omega_i,
                                      p.tnear_offset, jnp.inf,
                                      cfg.intersector)
    hi = intersect.hit_attributes(scene, o2, s.omega_i, hit)
    m2 = gather_materials(scene.materials, hi.mat_id)
    return s, hi, m2


def direct_brdf(key, scene, p, cfg, point, normal, m, d, from_inside, dst):
    """One BSDF sample; contributes only when it hits an emissive surface
    (pg/DirectBRDFIntegrator.cpp:7-49)."""
    s, hi, m2 = _trace_brdf_sample(key, scene, p, cfg, point, normal, m, d,
                                   from_inside, dst)
    wi, r_sqr, cos_y = _light_sample_geometry(point, hi.point, hi.normal)
    cos_i = jnp.maximum(mathx.dot(wi, normal), 0.0)
    ok = hi.did_hit & m2.is_emissive() & (r_sqr > 0.0) \
        & (cos_i > 0.0) & (cos_y > 0.0)
    area_factor = jnp.where(r_sqr > 0.0, cos_y / jnp.maximum(r_sqr, 1e-20), 0.0)
    denom = s.pdf * area_factor
    g = cos_i * cos_y / jnp.maximum(r_sqr, 1e-20)
    contrib = m2.emission * s.f_r * jnp.where(
        denom > 0.0, g / jnp.maximum(denom, 1e-30), 0.0)[..., None]
    return jnp.where(ok[..., None], contrib, 0.0)


def direct_mis(key, scene, p, cfg, point, normal, m, d, from_inside, dst):
    """Both strategies, power-heuristic weighted
    (pg/DirectMISIntegrator.cpp:38-144). With cfg.show_weights the MIS
    weights render as colors instead of radiance — BRDF-side weight in R,
    light-side weight in G (pg/DirectMISIntegrator.cpp:80-81, 134-135)."""
    k_l, k_b = jax.random.split(key)
    out = jnp.zeros_like(point)
    shape = point.shape[:-1]
    show = getattr(cfg, "show_weights", False)

    # --- BRDF side (evaluateBRDFSample)
    s, hi, m2 = _trace_brdf_sample(k_b, scene, p, cfg, point, normal, m, d,
                                   from_inside, dst)
    wi_b, r2_b, cosy_b = _light_sample_geometry(point, hi.point, hi.normal)
    cosi_b = jnp.maximum(mathx.dot(wi_b, normal), 0.0)
    ok_b = hi.did_hit & m2.is_emissive() & (r2_b > 0.0)
    area_factor = jnp.where(r2_b > 0.0, cosy_b / jnp.maximum(r2_b, 1e-20), 0.0)
    pdf_b_area = s.pdf * area_factor
    pdf_as_light = lights_mod.pdf_for_any_light_point(scene, shape) \
        if scene.lights.is_valid else jnp.zeros(shape)
    w_b = mathx.power_heuristic(pdf_b_area, pdf_as_light)
    if show:
        contrib_b = jnp.stack([w_b, jnp.zeros(shape), jnp.zeros(shape)],
                              axis=-1)
    else:
        contrib_b = m2.emission * s.f_r * jnp.where(
            s.pdf > 0.0, w_b * cosi_b / jnp.maximum(s.pdf, 1e-30),
            0.0)[..., None]
    out += jnp.where(ok_b[..., None], contrib_b, 0.0)

    # --- light side (evaluateLightSample)
    if scene.lights.is_valid:
        ls = lights_mod.sample_light_point(k_l, scene, shape)
        wi_l, r2_l, cosy_l = _light_sample_geometry(point, ls["point"],
                                                    ls["normal"])
        cosi_l = jnp.maximum(mathx.dot(wi_l, normal), 0.0)
        facing = (cosi_l > 0.0) & (cosy_l > 0.0) & (r2_l > 0.0)
        occ = intersect.test_occlusion(scene, point, ls["point"], p,
                                       cfg.intersector)
        pdf_if_brdf = brdf.pdf_bsdf(m, normal, d, wi_l)
        pdf_if_brdf_area = pdf_if_brdf * jnp.where(
            r2_l > 0.0, cosy_l / jnp.maximum(r2_l, 1e-20), 0.0)
        w_l = mathx.power_heuristic(ls["pdf_area"], pdf_if_brdf_area)
        g = cosi_l * cosy_l / jnp.maximum(r2_l, 1e-20)
        f_r = brdf.eval_bsdf(m, normal, d, wi_l)
        if show:
            contrib_l = jnp.stack([jnp.zeros(shape), w_l, jnp.zeros(shape)],
                                  axis=-1)
        else:
            contrib_l = ls["l_i"] * f_r * (
                w_l * g / jnp.maximum(ls["pdf_area"], 1e-20))[..., None]
        out += jnp.where((facing & ~occ & (w_l > 0.0))[..., None],
                         contrib_l, 0.0)
    return out


def direct_ris(key, scene, p, cfg, point, normal, m, d, n_candidates=8):
    """Per-pixel RIS over area-sampled candidates with target
    p_hat = |L_i f_r G V|: weighted-reservoir-sample one candidate, shade
    with the unbiased contribution weight W = w_sum / p_hat(selected)."""
    if not scene.lights.is_valid:
        return jnp.zeros_like(point)
    shape = point.shape[:-1]

    w_sum = jnp.zeros(shape)
    best_f = jnp.zeros(shape + (3,))
    best_phat = jnp.zeros(shape)
    best_pt = jnp.zeros(shape + (3,))

    for i in range(n_candidates):
        ki = rng.draw_key(key, i)
        ls = lights_mod.sample_light_point(ki, scene, shape)
        wi, r_sqr, cos_y = _light_sample_geometry(point, ls["point"],
                                                  ls["normal"])
        cos_i = jnp.maximum(mathx.dot(wi, normal), 0.0)
        g = jnp.where(r_sqr > 0.0, cos_i * cos_y / jnp.maximum(r_sqr, 1e-20),
                      0.0)
        f = ls["l_i"] * brdf.eval_bsdf(m, normal, d, wi) * g[..., None]
        phat = mathx.length(f)
        w = phat / (jnp.maximum(ls["pdf_area"], 1e-20) * n_candidates)
        w_sum += w
        u = jax.random.uniform(rng.draw_key(ki, 1000), shape)
        take = (w_sum > 0.0) & (u < w / jnp.maximum(w_sum, 1e-30))
        best_f = jnp.where(take[..., None], f, best_f)
        best_phat = jnp.where(take, phat, best_phat)
        best_pt = jnp.where(take[..., None], ls["point"], best_pt)

    occ = intersect.test_occlusion(scene, point, best_pt, p, cfg.intersector)
    w_ucw = jnp.where(best_phat > 0.0, w_sum / jnp.maximum(best_phat, 1e-30),
                      0.0)
    return jnp.where((~occ & (best_phat > 0.0))[..., None],
                     best_f * w_ucw[..., None], 0.0)


def calculate_direct(strategy, key, scene, p, cfg, point, normal, m, d,
                     from_inside, dst):
    if strategy == DirectStrategy.AREA:
        return direct_area(key, scene, p, cfg, point, normal, m, d)
    if strategy == DirectStrategy.BRDF:
        return direct_brdf(key, scene, p, cfg, point, normal, m, d,
                           from_inside, dst)
    if strategy == DirectStrategy.MIS:
        return direct_mis(key, scene, p, cfg, point, normal, m, d,
                          from_inside, dst)
    if strategy == DirectStrategy.RIS:
        return direct_ris(key, scene, p, cfg, point, normal, m, d,
                          cfg.ris_candidates)
    raise ValueError(f"unknown direct strategy {strategy!r}")
