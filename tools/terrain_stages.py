"""Bisect which restir pass faults the TPU on terrain100k@1080p, with
per-pass timings (device-chained)."""

import time

import jax
import jax.numpy as jnp

t0 = time.time()
float(jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones((8, 128))))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

from tpu_restir import rng  # noqa: E402
from tpu_restir.config import (CameraConfig, IntersectorConfig,  # noqa: E402
                               RenderConfig, RenderParams, RestirParams)
from tpu_restir.render import camera as cam_mod  # noqa: E402
from tpu_restir.scene.procedural import terrain_scene  # noqa: E402
from tpu_restir.render.integrators.restir import gbuffer as gb_mod  # noqa: E402
from tpu_restir.render.integrators.restir import reservoir as rsv  # noqa: E402
from tpu_restir.render.integrators.restir.initial import initial_pass  # noqa: E402
from tpu_restir.render.integrators.restir.shade import shade_pass  # noqa: E402
from tpu_restir.render.integrators.restir.spatial import spatial_pass  # noqa: E402
from tpu_restir.render.integrators.restir.temporal import temporal_pass  # noqa: E402

W, H = 1920, 1080
scene = terrain_scene(100_000)
cfg = RenderConfig(
    camera=CameraConfig(width=W, height=H, fov_y_deg=45.0,
                        view_from=(0., -7., 4.), view_at=(0., 0., 0.5),
                        pixel_sampler="random"),
    params=RenderParams(use_skybox=False),
    restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                        do_spatial_reuse=True, spatial_neighbor_count=5,
                        spatial_mis="pairwise"),
    intersector=IntersectorConfig(),
    integrator="restir")
cam = cam_mod.make_camera(cfg.camera)
seed = rng.make_frame_seed(0, 1)
ys = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W))
xs = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))


def stage(name, f, *args):
    try:
        t0 = time.time()
        out = jax.jit(f)(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        comp = time.time() - t0
        t0 = time.time()
        out = jax.jit(f)(*args)
        s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"{name}: ok compile {comp:.1f}s run {time.time()-t0:.2f}s "
              f"sum={s:.3g}", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        raise SystemExit(1)


gb = stage("gbuffer", lambda sc: gb_mod.gbuffer_fill(sc, cam, cfg, seed,
                                                     ys, xs), scene)
res = stage("initial", lambda sc, gb: initial_pass(seed, sc, gb, cfg,
                                                   ys, xs), scene, gb)
res_t = stage("temporal",
              lambda sc, gb, res: temporal_pass(
                  seed, sc, gb, gb, res, res, cfg, ys, xs,
                  gb_ext=gb, gb_prev_ext=gb, ext_row0=0), scene, gb, res)
res_s = stage("spatial",
              lambda sc, gb, res: spatial_pass(
                  seed, 0, sc, gb, res, cfg, ys, xs,
                  gb_ext=gb, res_ext=res, ext_row0=0, ext_top=0),
              scene, gb, res)
frame = stage("shade", lambda sc, gb, res: shade_pass(sc, gb, res, cfg),
              scene, gb, res_s)
print("ALL STAGES OK", flush=True)
