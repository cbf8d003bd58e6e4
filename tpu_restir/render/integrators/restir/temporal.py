"""PASS 4: temporal reuse with bidirectional reprojection.

Reference: temporalReusePass + reprojectBackward/Forward
(pg/ReSTIRIntegrator.cpp:544-587, 625-732). Rejection cascade: invalid
backward reprojection -> depth-ratio < 0.9 -> invalid forward
reprojection -> forward depth-ratio < 0.9; on any rejection the current
reservoir passes through unchanged. Accepted pixels MIS-combine the
current and previous reservoirs with confidence-weighted balance
heuristic weights.

Faithful quirk (SURVEY.md §2.5): the *previous reservoir* is read at the
CURRENT pixel while the previous *G-buffer element* is read at the
reprojected pixel (pg/ReSTIRIntegrator.cpp:641 vs :652).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_restir import mathx, rng
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.restir import gbuffer as gb_mod
from tpu_restir.render.integrators.restir import reservoir as rsv
from tpu_restir.render.integrators.restir.phat import evaluate_p_hat


def temporal_pass(key, scene, gb: gb_mod.GBuffer, gb_prev: gb_mod.GBuffer,
                  res_cur: rsv.Reservoir, res_prev: rsv.Reservoir,
                  cfg) -> rsv.Reservoir:
    p = cfg.params
    r = cfg.restir
    h, w = gb.depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")

    # backward: current surface into the previous camera
    bx, by, valid_b = cam_mod.project_to_screen(
        gb_prev.view_mat, gb_prev.focal, w, h, gb.pos)
    bxc = jnp.clip(bx, 0, w - 1)
    byc = jnp.clip(by, 0, h - 1)
    prev_elem = gb_mod.gather(gb_prev, byc, bxc)

    cur_depth = mathx.length(gb.pos - gb.cam_pos)
    prev_depth = mathx.length(prev_elem.pos - gb_prev.cam_pos)
    ratio = jnp.minimum(cur_depth, prev_depth) / jnp.maximum(
        jnp.maximum(cur_depth, prev_depth), 1e-20)
    depth_ok = ratio >= 0.9

    # forward: last frame's surface at this pixel into the current camera
    prev_at_cur_pos = gb_prev.pos  # gb_prev at the current pixel (no gather)
    fx, fy, valid_f = cam_mod.project_to_screen(
        gb.view_mat, gb.focal, w, h, prev_at_cur_pos)
    fxc = jnp.clip(fx, 0, w - 1)
    fyc = jnp.clip(fy, 0, h - 1)
    fw_elem_pos = gb.pos[fyc, fxc]
    cur_depth_p = mathx.length(prev_at_cur_pos - gb_prev.cam_pos)
    prev_depth_p = mathx.length(fw_elem_pos - gb.cam_pos)
    ratio_p = jnp.minimum(cur_depth_p, prev_depth_p) / jnp.maximum(
        jnp.maximum(cur_depth_p, prev_depth_p), 1e-20)
    depth_ok_p = ratio_p >= 0.9

    accept = valid_b & depth_ok & valid_f & depth_ok_p

    # --- confidence-weighted MIS combine (pg/ReSTIRIntegrator.cpp:694-731)
    cur_s = res_cur.sample
    prev_s = res_prev.sample
    conf_c = res_cur.confidence
    conf_p = res_prev.confidence

    def ph(sample, surf):
        return evaluate_p_hat(sample, scene, surf, True, p, cfg.intersector)

    p_cur_cs = ph(cur_s, gb)          # current sample at current surface
    p_prev_cs = ph(cur_s, prev_elem)  # current sample at previous surface
    denom_c = p_cur_cs * conf_c + p_prev_cs * conf_p
    m_cur = jnp.where(denom_c > 0.0,
                      p_cur_cs * conf_c / jnp.maximum(denom_c, 1e-30), 0.0)

    p_cur_ps = ph(prev_s, gb)
    p_prev_ps = ph(prev_s, prev_elem)
    denom_p = p_cur_ps * conf_c + p_prev_ps * conf_p
    m_prev = jnp.where(denom_p > 0.0,
                       p_prev_ps * conf_p / jnp.maximum(denom_p, 1e-30), 0.0)

    out = rsv.empty_reservoir(gb.depth.shape)
    k1, k2 = jax.random.split(rng.pass_key(key, rng.PASS_TEMPORAL))
    out, _ = rsv.add_sample(out, k1, cur_s, m_cur * p_cur_cs * res_cur.w,
                            conf_c)
    out, _ = rsv.add_sample(out, k2, prev_s, m_prev * p_cur_ps * res_prev.w,
                            conf_p)
    out = rsv.cap_confidence(out, r.confidence_cap)

    final_p_hat = ph(out.sample, gb)
    out = out.replace(w=jnp.where(
        final_p_hat > 0.0, out.w_sum / jnp.maximum(final_p_hat, 1e-30), 0.0))

    return rsv.select(accept, out, res_cur)
