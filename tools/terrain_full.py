"""Full restir_step on terrain100k @1080p — the round-2 crash config.
Run with a long wall clock; prints compile + steady frame time."""

import time

import jax
import jax.numpy as jnp

t0 = time.time()
w = jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones((8, 128)))
float(w)
print(f"warmup {time.time()-t0:.1f}s", flush=True)

from tpu_restir import rng  # noqa: E402
from tpu_restir.config import (CameraConfig, IntersectorConfig,  # noqa: E402
                               RenderConfig, RenderParams, RestirParams)
from tpu_restir.render import camera as cam_mod  # noqa: E402
from tpu_restir.scene.procedural import terrain_scene  # noqa: E402
from tpu_restir.render.integrators.restir.pipeline import (  # noqa: E402
    init_restir_state, restir_step)

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
state = init_restir_state(H, W)
step = jax.jit(restir_step, static_argnames=("cfg",))
t0 = time.time()
frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, 0), state,
                    jnp.asarray(0))
s = float(jnp.sum(frame))
print(f"compile+first {time.time()-t0:.1f}s sum={s:.2f}", flush=True)
reps = 4
t0 = time.time()
for f in range(1, reps + 1):
    frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, f), state,
                        jnp.asarray(f))
sf = float(jnp.sum(frame))
dt = (time.time() - t0) / reps
import bench  # noqa: E402

rpp = bench.rays_per_pixel(cfg)
print(f"steady {dt*1e3:.0f} ms/frame -> {rpp*W*H/dt/1e6:.1f} Mrays/s "
      f"(rpp={rpp}) sum={sf:.2f}", flush=True)
