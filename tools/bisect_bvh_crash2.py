"""Stage 2 bisect: which part of the full-terrain restir_step faults the TPU.

Stages:
  chunked_closest  — intersect_closest (bvh backend) at 1080p ray count
  chunked_any      — intersect_any (bvh backend) at 1080p ray count
  gbuffer          — G-buffer fill pass only
  full             — one restir_step (the bench config)
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
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "chunked_closest", "chunked_any", "gbuffer", "full"]
    scene = terrain_scene(100_000)
    cfg = RenderConfig(
        camera=CameraConfig(width=W, height=H, fov_y_deg=45.0,
                            view_from=(0.0, -7.0, 4.0),
                            view_at=(0.0, 0.0, 0.5),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                            do_spatial_reuse=True, spatial_neighbor_count=5,
                            spatial_mis="pairwise"),
        intersector=IntersectorConfig(ray_chunk=1 << 18, tri_block=2048),
        integrator="restir")
    cam = cam_mod.make_camera(cfg.camera)

    n = W * H
    g = np.random.default_rng(0)
    o = np.tile(np.array([0.0, -7.0, 4.0], np.float32), (n, 1))
    d = g.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tn = jnp.float32(0.01)
    tf = jnp.float32(1e30)

    for st in stages:
        t0 = time.perf_counter()
        try:
            if st == "chunked_closest":
                fn = jax.jit(lambda o, d: intersect_closest(
                    scene, o, d, tn, tf, cfg.intersector))
                hit = fn(o, d)
                print(f"{st}: ok hits={int(jnp.sum(hit.hit))} "
                      f"t={time.perf_counter()-t0:.1f}s", flush=True)
            elif st == "chunked_any":
                fn = jax.jit(lambda o, d: intersect_any(
                    scene, o, d, tn, tf, cfg.intersector))
                occ = fn(o, d)
                print(f"{st}: ok occ={int(jnp.sum(occ))} "
                      f"t={time.perf_counter()-t0:.1f}s", flush=True)
            elif st == "gbuffer":
                from tpu_restir.render.integrators.restir.gbuffer import (
                    gbuffer_fill)
                fn = jax.jit(lambda key: gbuffer_fill(
                    scene, cam, cfg, key))
                gb = fn(rng.make_frame_seed(0, 0))
                print(f"{st}: ok sum={float(jnp.sum(gb.depth)):.2f} "
                      f"t={time.perf_counter()-t0:.1f}s", flush=True)
            elif st == "full":
                from tpu_restir.render.integrators.restir.pipeline import (
                    init_restir_state, restir_step)
                state = init_restir_state(H, W)
                step = jax.jit(restir_step, static_argnames=("cfg",))
                frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, 0),
                                    state, jnp.asarray(0))
                print(f"{st}: ok sum={float(jnp.sum(frame)):.2f} "
                      f"t={time.perf_counter()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{st}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
