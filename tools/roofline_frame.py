"""Whole-frame roofline: per-pass measured ms + speed-of-light models
for ALL THREE bench scenes (VERDICT r4 ask #8 — the r4 report covered
only the terrain intersection kernels).

Per scene (cornell / lights1k / terrain100k, 1080p full spatiotemporal
ReSTIR, pairwise MIS, M=1+1):
  * measured per-pass ms via amortized PREFIX timing (the renderer's
    profile_stop_after mechanism, N perturbed frame seeds inside one
    jit — the tunneled backend's ~26 ms dispatch floor is subtracted
    once per measurement);
  * model lines for the named components: intersection queries
    (ptrace / fused spec by backend), the spatial windowed gather
    (take-count model), p_hat elementwise evaluation, G-buffer fill and
    shade streams;
  * a frame-level % of speed-of-light.

Writes/overwrites the "frame roofline" section consumed by
docs/ROOFLINE.md (run tools/roofline_report.py first for the terrain
kernel section). Run on the chip:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/roofline_frame.py
"""

import sys
import time

import jax
import jax.numpy as jnp

from tpu_restir import rng, roofline
from tpu_restir.config import (CameraConfig, IntersectorConfig, RenderConfig,
                               RenderParams, RestirParams)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render import intersect as intersect_mod
from tpu_restir.render.integrators.restir.pipeline import (init_restir_state,
                                                           restir_step)

W, H = 1920, 1080
N_PIX = W * H
DISPATCH_S = 0.026
INNER = 4


def _cfg(stop=None):
    return RenderConfig(
        camera=CameraConfig(width=W, height=H, fov_y_deg=45.0,
                            view_from=(0.0, -3.9, 1.0),
                            view_at=(0.0, 0.0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                            do_spatial_reuse=True, spatial_neighbor_count=5,
                            spatial_mis="pairwise"),
        intersector=IntersectorConfig(ray_chunk=1 << 18, tri_block=2048),
        integrator="restir", profile_stop_after=stop)


def _terrain_cam():
    return CameraConfig(width=W, height=H, fov_y_deg=45.0,
                        view_from=(0.0, -7.0, 4.0),
                        view_at=(0.0, 0.0, 0.5), pixel_sampler="random")


def measure_prefix(scene, cam, cfg):
    state = init_restir_state(H, W)

    @jax.jit
    def run(state):
        def body(i, carry):
            st, acc = carry
            fr, st = restir_step(scene, cam, cfg,
                                 rng.make_frame_seed(0, i), st, i)
            # depend on frame AND state: the profile_stop_after prefixes
            # return a zero frame + the computed state, so summing only
            # `fr` would let XLA dead-code the whole prefix
            acc = (acc + jnp.sum(fr) + jnp.sum(st.gb_prev.depth)
                   + jnp.sum(st.res_prev.w_sum))
            return st, acc
        _st, acc = jax.lax.fori_loop(
            0, INNER, body, (state, jnp.float32(0.0)))
        return acc

    float(run(state))
    t0 = time.perf_counter()
    float(run(state))
    return ((time.perf_counter() - t0) - DISPATCH_S) / INNER


def scene_report(label, scene, cam_cfg):
    cam = cam_mod.make_camera(cam_cfg)
    stages = ["gbuffer", "initial", "temporal", "spatial", None]
    names = ["gbuffer", "initial", "temporal", "spatial", "shade"]
    times, prev = {}, 0.0
    for st, nm in zip(stages, names):
        cum = measure_prefix(scene, cam, _cfg(st))
        times[nm] = max(cum - prev, 0.0)
        prev = cum
    frame_s = prev

    # traced query census for this config
    intersect_mod.QUERY_LOG = qlog = []
    cfg = _cfg(None)
    st0 = init_restir_state(H, W)
    jax.eval_shape(lambda s: restir_step(scene, cam, cfg,
                                         rng.make_frame_seed(0, 0), s,
                                         jnp.asarray(0)), st0)
    intersect_mod.QUERY_LOG = None
    census = roofline.summarize_query_log(qlog)

    # --- models
    fm = roofline.FrameModel()
    backend = qlog[0]["backend"] if qlog else "?"
    n_q_closest = census.get("closest", {}).get("queries", 0)
    n_q_any = census.get("any", {}).get("queries", 0)
    r_closest = census.get("closest", {}).get("rays", 0)
    r_any = census.get("any", {}).get("rays", 0)
    if backend == "fused":
        fm.add(roofline.fused_query_spec(
            f"intersect closest x{n_q_closest}", r_closest,
            scene.num_tris))
        fm.add(roofline.fused_query_spec(
            f"intersect any x{n_q_any}", r_any, scene.num_tris))
    else:
        # conservative: every query visits its full mean shortlist
        from tpu_restir.accel.fcluster import _clamp_tfar_bbox
        from tpu_restir.kernels.cluster_trace import (build_shortlists,
                                                      pick_factor,
                                                      _super_boxes)
        f = pick_factor(scene.cluster_tris.shape[0])
        scmin, scmax = _super_boxes(scene.cluster_min, scene.cluster_max,
                                    f)
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        o, d = cam_mod.generate_rays_at(cam, cam_cfg, jnp.uint32(1),
                                        ys, xs)
        of = o.reshape(-1, 3)
        df = d.reshape(-1, 3)
        tn = jnp.full((N_PIX,), 0.01)
        tf = _clamp_tfar_bbox(of, df, tn, jnp.full((N_PIX,), 1e30),
                              jnp.min(scmin, axis=0),
                              jnp.max(scmax, axis=0))
        cnt, _sl, _e = build_shortlists(of, df, tn, tf, scmin, scmax)
        visited = float(jnp.sum(cnt)) * f
        b = scene.cluster_tris.shape[1]
        fm.add(roofline.ptrace_query_spec(
            f"intersect closest x{n_q_closest} (primary lists)",
            r_closest, int(visited * n_q_closest), b))
        # shadow-query model: shortlists of REAL shadow segments (hit
        # point -> emissive sample), not the primary frustum's
        from tpu_restir.config import IntersectorConfig
        hit = intersect_mod.intersect_closest(
            scene, of, df, tn, jnp.full((N_PIX,), 1e30),
            IntersectorConfig(backend="ptrace"))
        hp = of + df * jnp.where(jnp.isfinite(hit.t), hit.t, 1.0)[:, None]
        import numpy as _np
        _r = _np.random.default_rng(5)
        e_idx = scene.lights.tri_idx
        pick = jnp.asarray(_r.integers(0, e_idx.shape[0], N_PIX))
        tgt = scene.tri_v0[e_idx[pick]]
        seg = tgt - hp
        dist = jnp.linalg.norm(seg, axis=-1)
        sdir = seg / jnp.maximum(dist, 1e-9)[:, None]
        cnt2, _s2, _e2 = build_shortlists(hp, sdir, tn, dist - 1e-3,
                                          scmin, scmax)
        visited2 = float(jnp.sum(cnt2)) * f
        fm.add(roofline.ptrace_query_spec(
            f"intersect any x{n_q_any} (shadow lists)", r_any,
            int(visited2 * n_q_any), b))
    n_phat = 4 + 17 + (1 + 1 + 1)   # temporal 4 + spatial 17 + initial 3
    fm.add(roofline.phat_spec(f"p_hat eval x{n_phat}", N_PIX, n_phat))
    from tpu_restir.render.integrators.restir import packed as pk
    ch = pk.gb_ch(pk.reuse_slim(scene.materials)) + (
        pk.RES_CH_SLIM if pk.reuse_slim(scene.materials) else pk.RES_CH)
    fm.add(roofline.gather_spec("spatial neighbor gather", N_PIX, 5, ch,
                                5))
    fm.add(roofline.shading_spec("gbuffer fill streams", N_PIX, 300, 30))
    fm.add(roofline.shading_spec("reservoir/shade streams", N_PIX, 500,
                                 60))

    lines = [f"## {label} ({scene.num_tris} tris, backend {backend}, "
             f"payload {ch} ch)"]
    lines.append("measured per-pass ms (amortized prefix): "
                 + ", ".join(f"{k} {v*1e3:.1f}" for k, v in times.items())
                 + f"; frame {frame_s*1e3:.1f} ms "
                 f"({census['total_rays']/frame_s/1e6:.1f} Mrays/s)")
    lines.append(fm.report(frame_s))
    return "\n".join(lines)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from tpu_restir.scene import cornell_box
    from tpu_restir.scene.cornell import many_lights_scene
    from tpu_restir.scene.procedural import terrain_scene

    blocks = []
    for label, scene, cam_cfg in (
            ("cornell", cornell_box(), _cfg().camera),
            ("lights1k", many_lights_scene(1000), _cfg().camera),
            ("terrain100k", terrain_scene(100_000), _terrain_cam())):
        blocks.append(scene_report(label, scene, cam_cfg))
        print(blocks[-1], flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write("# Whole-frame roofline (1080p ReSTIR, v5e 1 chip)\n\n"
                    + "\n\n".join(blocks) + "\n")


if __name__ == "__main__":
    main()
