"""Speed-of-light / roofline report for the hot kernels on real TPU.

Measures (amortized, dispatch-overhead-corrected) the ptrace query
kernels and the full ReSTIR frame on terrain100k@1080p, computes each
kernel's FLOPs/bytes from instrumented shortlist counts
(tpu_restir.roofline), and writes docs/ROOFLINE.md. Run on the chip:

    python tools/roofline_report.py [out.md]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir import roofline
from tpu_restir.accel.fcluster import _clamp_tfar_bbox
from tpu_restir.config import (CameraConfig, IntersectorConfig, RenderConfig,
                               RenderParams, RestirParams)
from tpu_restir.kernels import cluster_trace as ct
from tpu_restir.render import camera as cam_mod
from tpu_restir.render import intersect
from tpu_restir.scene.procedural import terrain_scene

W, H = 1920, 1080
DISPATCH_S = 0.026  # measured tunneled-backend round-trip floor


def amortize(fn, arg, inner: int, reps: int = 3):
    """Time fn(arg) with `inner` perturbed evaluations inside one jit."""

    @jax.jit
    def g(x):
        acc = 0.0
        for i in range(inner):
            out = fn(x + i * 1e-7)
            acc += sum(jnp.sum(jnp.where(jnp.isfinite(le), le, 0.0)
                               .astype(jnp.float32))
                       for le in jax.tree.leaves(out))
        return acc

    float(g(arg))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g(arg))
    return ((time.perf_counter() - t0) / reps - DISPATCH_S) / inner


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/ROOFLINE.md"
    scene = terrain_scene(100_000)
    block = scene.cluster_size
    n = W * H
    icfg = IntersectorConfig(backend="ptrace")
    cam_cfg = CameraConfig(width=W, height=H, fov_y_deg=45.0,
                           view_from=(0.0, -7.0, 4.0),
                           view_at=(0.0, 0.0, 0.5))
    cam = cam_mod.make_camera(cam_cfg)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    o, d = cam_mod.generate_rays_at(cam, cam_cfg, jnp.uint32(1), ys, xs)
    tn = jnp.full((H, W), 0.01, jnp.float32)
    tf = jnp.full((H, W), 1e30, jnp.float32)
    cmin, cmax = scene.cluster_min, scene.cluster_max
    lo, hi = jnp.min(cmin, 0), jnp.max(cmax, 0)

    lines = ["# Roofline / speed-of-light report (terrain100k @ 1080p, "
             "TPU v5e 1 chip)", "",
             f"cluster block B={block}, clusters C={cmin.shape[0]}, "
             f"packet P={ct.P}", ""]

    # --- primary closest-hit query
    from tpu_restir.render.intersect import _tile_fold
    of = _tile_fold(o.reshape(-1, 3), H, W)
    df = _tile_fold(d.reshape(-1, 3), H, W)
    tnf = tn.reshape(-1)
    tff = tf.reshape(-1)
    tfc = _clamp_tfar_bbox(of, df, tnf, tff, lo, hi)
    cnt, _sl, ent = jax.jit(lambda o, d, tn, tf: ct.build_shortlists(
        o, d, tn, tf, cmin, cmax))(of, df, tnf, tfc)
    cnts = np.asarray(cnt)

    t_close = amortize(
        lambda o: intersect.intersect_closest(scene, o, d, tn, tf, icfg),
        o, inner=4)
    # watermark-effective visited clusters (simulated with the true hits)
    h1 = intersect.intersect_closest(scene, o, d, tn, tf, icfg)
    tb = np.asarray(jnp.where(h1.hit, h1.t, jnp.inf))
    tbs = _tile_fold(jnp.asarray(tb).reshape(-1), H, W)
    maxt = np.minimum(np.asarray(tbs).reshape(-1, ct.P),
                      np.asarray(tfc).reshape(-1, ct.P)).max(axis=1)
    eff = np.minimum((np.asarray(ent) <= maxt[:, None]).sum(axis=1), cnts)
    spec = roofline.ptrace_query_spec("closest(primary)", n,
                                      int(eff.sum()), block)
    lines.append(spec.report(t_close))
    p1 = roofline.phase1_spec("  phase1(cull+sort)", n, cmin.shape[0])
    lines.append(p1.report())

    # --- shadow any-hit query (hit points -> random panel targets)
    hp = o + d * np.asarray(jnp.where(h1.hit, h1.t, 1.0))[..., None]
    rng_np = np.random.default_rng(5)
    tgt = jnp.asarray(np.stack(
        [rng_np.uniform(-1.5, 1.5, (H, W)),
         rng_np.uniform(-1.5, 1.5, (H, W)),
         np.full((H, W), 6.6)], -1).astype(np.float32))
    seg = tgt - hp
    dist = jnp.linalg.norm(seg, axis=-1)
    sd = seg / jnp.maximum(dist, 1e-9)[..., None]
    stf = dist - 1e-3
    t_any = amortize(
        lambda hp: intersect.intersect_any(scene, hp, sd, tn, stf, icfg),
        jnp.asarray(hp), inner=4)
    hpf = _tile_fold(jnp.asarray(hp).reshape(-1, 3), H, W)
    sdf = _tile_fold(sd.reshape(-1, 3), H, W)
    stff = _tile_fold(stf.reshape(-1), H, W)
    tfc2 = _clamp_tfar_bbox(hpf, sdf, tnf, stff, lo, hi)
    cnt2, _, _ = jax.jit(lambda o, d, tn, tf: ct.build_shortlists(
        o, d, tn, tf, cmin, cmax))(hpf, sdf, tnf, tfc2)
    spec2 = roofline.ptrace_query_spec("any(shadow)", n,
                                       int(np.asarray(cnt2).sum()), block)
    lines.append(spec2.report(t_any))

    # --- full frame with traced-query log
    from tpu_restir.render.integrators.restir.pipeline import (
        init_restir_state, restir_step)
    from tpu_restir import rng as rngm
    cfg = RenderConfig(
        camera=CameraConfig(width=W, height=H, fov_y_deg=45.0,
                            view_from=(0.0, -7.0, 4.0),
                            view_at=(0.0, 0.0, 0.5),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                            do_spatial_reuse=True, spatial_neighbor_count=5,
                            spatial_mis="pairwise"),
        intersector=icfg, integrator="restir")
    state = init_restir_state(H, W)
    step = jax.jit(restir_step, static_argnames=("cfg",))
    intersect.QUERY_LOG = log = []
    frame, state = step(scene, cam, cfg, rngm.make_frame_seed(0, 0), state,
                        jnp.asarray(0))
    float(jnp.sum(frame))
    intersect.QUERY_LOG = None
    agg = roofline.summarize_query_log(log)
    reps = 4
    t0 = time.perf_counter()
    for f in range(1, reps + 1):
        frame, state = step(scene, cam, cfg, rngm.make_frame_seed(0, f),
                            state, jnp.asarray(f))
        float(jnp.sum(frame))
    dt = (time.perf_counter() - t0) / reps
    lines += ["", f"full frame: {dt*1e3:.0f} ms; traced queries: "
              + ", ".join(f"{k} x{v['queries']} ({v['rays']/1e6:.1f}M rays)"
                          for k, v in agg.items() if isinstance(v, dict)),
              f"traced rays/frame = {agg['total_rays']/1e6:.1f}M "
              f"({agg['total_rays']/n:.1f} rays/pixel measured vs "
              "bench.rays_per_pixel analytic)",
              f"frame throughput = {agg['total_rays']/dt/1e6:.1f} Mrays/s "
              "(traced-ray basis)"]

    # frame-level SoL estimate: shadow-query model x any-count +
    # closest model x closest-count
    nq_any = agg.get("any", {"queries": 0})["queries"]
    nq_cl = agg.get("closest", {"queries": 0})["queries"]
    sol_frame = (spec2.sol_time_s() * nq_any + spec.sol_time_s() * nq_cl)
    lines.append(
        f"frame SoL (intersection only) ~= {sol_frame*1e3:.0f} ms -> "
        f"measured frame is {dt/max(sol_frame,1e-9):.1f}x the "
        "intersection speed-of-light")

    text = "\n".join(lines) + "\n"
    print(text)
    import os
    os.makedirs("docs", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
