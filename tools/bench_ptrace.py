"""Measure ptrace backend on the real chip: raw query throughput on
terrain100k (closest + any, primary-like rays + shadow-like rays), then
optionally the full restir_step. Usage:
    python tools/bench_ptrace.py [raw|full|raw,full]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir import rng
from tpu_restir.config import (CameraConfig, IntersectorConfig, RenderConfig,
                               RenderParams, RestirParams)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.intersect import intersect_any, intersect_closest
from tpu_restir.scene.procedural import terrain_scene

W, H = 1920, 1080


def main():
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else ["raw"]
    scene = terrain_scene(100_000)
    print(f"tris={scene.num_tris} clusters={scene.cluster_tris.shape[0]} "
          f"B={scene.cluster_tris.shape[1]}", flush=True)
    icfg = IntersectorConfig(backend="ptrace")
    n = W * H
    cam_cfg = CameraConfig(width=W, height=H, fov_y_deg=45.0,
                           view_from=(0.0, -7.0, 4.0),
                           view_at=(0.0, 0.0, 0.5))
    cam = cam_mod.make_camera(cam_cfg)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    o, d = cam_mod.generate_rays_at(cam, cam_cfg, jnp.uint32(1), ys, xs)
    tn = jnp.full((H, W), 0.01, jnp.float32)
    tf = jnp.full((H, W), 1e30, jnp.float32)

    if "raw" in stages:
        fn = jax.jit(lambda o, d, tn, tf: intersect_closest(
            scene, o, d, tn, tf, icfg))
        t0 = time.perf_counter()
        h = fn(o, d, tn, tf)
        nh = int(jnp.sum(h.hit))
        print(f"closest compile+run: {time.perf_counter()-t0:.1f}s "
              f"hits={nh}", flush=True)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            h = fn(o, d, tn, tf)
            float(jnp.sum(h.t))
        dt = (time.perf_counter() - t0) / reps
        print(f"closest steady: {dt*1e3:.1f} ms -> {n/dt/1e6:.1f} Mrays/s",
              flush=True)

        # shadow-like rays: from the hit points toward the sun panel
        hp = o + d * jnp.where(jnp.isfinite(h.t), h.t, 1.0)[..., None]
        rng_np = np.random.default_rng(5)
        tgt = np.stack([rng_np.uniform(-1.5, 1.5, (H, W)),
                        rng_np.uniform(-1.5, 1.5, (H, W)),
                        np.full((H, W), 6.6)], axis=-1).astype(np.float32)
        seg = jnp.asarray(tgt) - hp
        dist = jnp.linalg.norm(seg, axis=-1)
        sd = seg / jnp.maximum(dist, 1e-9)[..., None]
        fa = jax.jit(lambda o, d, tn, tf: intersect_any(
            scene, o, d, tn, tf, icfg))
        t0 = time.perf_counter()
        occ = fa(hp, sd, tn, dist - 1e-3)
        print(f"any compile+run: {time.perf_counter()-t0:.1f}s "
              f"occ={int(jnp.sum(occ))}", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            occ = fa(hp, sd, tn, dist - 1e-3)
            int(jnp.sum(occ))
        dt = (time.perf_counter() - t0) / reps
        print(f"any steady: {dt*1e3:.1f} ms -> {n/dt/1e6:.1f} Mrays/s",
              flush=True)

    if "full" in stages:
        from tpu_restir.render.integrators.restir.pipeline import (
            init_restir_state, restir_step)
        cfg = RenderConfig(
            camera=CameraConfig(width=W, height=H, fov_y_deg=45.0,
                                view_from=(0.0, -7.0, 4.0),
                                view_at=(0.0, 0.0, 0.5),
                                pixel_sampler="random"),
            params=RenderParams(use_skybox=False),
            restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                                do_spatial_reuse=True,
                                spatial_neighbor_count=5,
                                spatial_mis="pairwise"),
            intersector=icfg,
            integrator="restir")
        state = init_restir_state(H, W)
        step = jax.jit(restir_step, static_argnames=("cfg",))
        t0 = time.perf_counter()
        frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, 0),
                            state, jnp.asarray(0))
        s = float(jnp.sum(frame))
        print(f"full compile+run: {time.perf_counter()-t0:.1f}s sum={s:.1f}",
              flush=True)
        reps = 4
        t0 = time.perf_counter()
        for f in range(1, reps + 1):
            frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, f),
                                state, jnp.asarray(f))
            float(jnp.sum(frame))
        dt = (time.perf_counter() - t0) / reps
        import bench
        rpp = bench.rays_per_pixel(cfg)
        print(f"full steady: {dt*1e3:.1f} ms/frame -> "
              f"{rpp*n/dt/1e6:.1f} Mrays/s (rpp={rpp})", flush=True)


if __name__ == "__main__":
    main()
