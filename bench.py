"""Benchmark: Mrays/s for the full ReSTIR pipeline at 1080p on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU renderer sustains ~2 Mrays/s
(BASELINE.md "derived throughput": 1280x720 MIS 1spp at 0.946 s/frame,
>=2 rays per pixel sample). Ray counting mirrors the reference's
rtcIntersect1/rtcOccluded1 call sites: every closest-hit or occlusion
query counts as one ray.
"""

import json
import time

import jax
import jax.numpy as jnp

from tpu_restir import rng
from tpu_restir.diff.params import extract_params
from tpu_restir.diff.render import loss_fn
from tpu_restir.config import (CameraConfig, IntersectorConfig, RenderConfig,
                               RenderParams, RestirParams)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.restir.pipeline import (
    init_restir_state, restir_step)
from tpu_restir.scene import cornell_box

WIDTH, HEIGHT = 1920, 1080
N_FRAMES = 8


def rays_per_pixel(cfg: RenderConfig) -> int:
    """Closest-hit + occlusion queries per pixel per frame for this config
    (matches the reference's per-pass trace counts, SURVEY.md §3.2)."""
    r = cfg.restir
    test_vis = 0 if r.do_visibility_pass else 1
    closest = 1 + r.m_brdf                      # G-buffer + BRDF candidates
    occl = (r.m_area + r.m_brdf + 1) * test_vis  # initial p_hats + finalize
    occl += 1 if r.do_visibility_pass else 0
    if r.do_temporal_reuse:
        occl += 5                                # 4 MIS p_hats + finalize
    if r.do_spatial_reuse:
        k = r.spatial_neighbor_count
        if r.spatial_mis == "balance":
            per_pass = (k + 1) ** 2 + 1
        elif r.spatial_mis == "pairwise":
            per_pass = 3 * k + 2
        else:
            per_pass = (k + 1) + 1
        occl += per_pass * r.spatial_pass_count
    occl += 1                                    # final shading visibility
    return closest + occl


def main():
    cfg = RenderConfig(
        camera=CameraConfig(width=WIDTH, height=HEIGHT, fov_y_deg=45.0,
                            view_from=(0.0, -3.9, 1.0),
                            view_at=(0.0, 0.0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=True,
                            do_spatial_reuse=True, spatial_neighbor_count=5,
                            spatial_mis="pairwise"),
        intersector=IntersectorConfig(ray_chunk=1 << 18, tri_block=2048),
        integrator="restir")
    scene = cornell_box()
    cam = cam_mod.make_camera(cfg.camera)
    state = init_restir_state(HEIGHT, WIDTH)
    step = jax.jit(restir_step, static_argnames=("cfg",))

    # warmup / compile (retry once: the tunneled TPU backend occasionally
    # throws a transient FAILED_PRECONDITION during the first lowering).
    # The instrumented query log records every traced intersection query's
    # ray count — the measured rays/frame that cross-checks the analytic
    # rays_per_pixel model (tpu_restir.roofline.summarize_query_log).
    from tpu_restir.render import intersect as intersect_mod
    intersect_mod.QUERY_LOG = qlog = []
    for attempt in range(2):
        try:
            frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, 0),
                                state, jnp.asarray(0))
            float(jnp.sum(frame))
            break
        except Exception:
            if attempt == 1:
                raise
            time.sleep(5.0)
    intersect_mod.QUERY_LOG = None
    traced_rays = sum(e["rays"] for e in qlog)
    traced_rpp = traced_rays / float(WIDTH * HEIGHT)

    # NOTE: sync via ONE scalar fetch after the loop — frames chain
    # through the reservoir state and the device queue is FIFO, so the
    # final frame's sum completing implies every frame executed; a
    # per-frame fetch would add the tunneled backend's ~26 ms round trip
    # to every frame (jax.block_until_ready returns before device work
    # completes on this backend, so it cannot be used either).
    t0 = time.perf_counter()
    for f in range(1, N_FRAMES + 1):
        frame, state = step(scene, cam, cfg, rng.make_frame_seed(0, f),
                            state, jnp.asarray(f))
    float(jnp.sum(frame))
    dt = time.perf_counter() - t0

    # throughput on the TRACED ray count (exact); the analytic
    # rays_per_pixel(cfg) stays as the cross-check in the unit string
    rays_frame = traced_rays if traced_rays else (
        rays_per_pixel(cfg) * WIDTH * HEIGHT)
    mrays_fwd = rays_frame * N_FRAMES / dt / 1e6

    # --- fwd+bwd: value_and_grad of a pixel loss w.r.t. material params
    # through one full ReSTIR frame (the driver metric is
    # "Mrays/s/chip fwd+bwd at 1080p ReSTIR") -------------------------------
    params = extract_params(scene)
    target = jnp.zeros((HEIGHT, WIDTH, 3))
    vg = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, scene, cam, cfg, (1,), target)))
    v, _g = vg(params)
    float(v)
    n_bwd = 3
    t0 = time.perf_counter()
    for _ in range(n_bwd):
        v, _g = vg(params)
    float(v)  # in-order device queue: last value implies all executed
    dt_bwd = (time.perf_counter() - t0) / n_bwd
    mrays_fwd_bwd = rays_frame / dt_bwd / 1e6

    # --- secondary scene configs (BASELINE.json config 3 many-lights;
    # VERDICT round-1 item 1 large-scene story). Guarded: a failure or
    # slow compile of a secondary metric must never lose the main one.
    extras = []
    for label, scene_fn, n_frames in (
            ("lights1k", lambda: __import__(
                "tpu_restir.scene.cornell", fromlist=["many_lights_scene"]
            ).many_lights_scene(1000), 4),
            ("terrain100k", lambda: __import__(
                "tpu_restir.scene.procedural", fromlist=["terrain_scene"]
            ).terrain_scene(100_000), 4)):
        try:
            sc = scene_fn()
            cam2 = cam_mod.make_camera(cfg.camera) if label == "lights1k" \
                else cam_mod.make_camera(cfg.camera.__class__(
                    width=WIDTH, height=HEIGHT, fov_y_deg=45.0,
                    view_from=(0.0, -7.0, 4.0), view_at=(0.0, 0.0, 0.5),
                    pixel_sampler="random"))
            st = init_restir_state(HEIGHT, WIDTH)
            # per-scene traced-ray log: query counts are config-determined
            # but logging each scene separately catches scene-dependent
            # query regressions (e.g. the emissive-subset path)
            intersect_mod.QUERY_LOG = qlog2 = []
            frame, st = step(sc, cam2, cfg, rng.make_frame_seed(0, 0), st,
                             jnp.asarray(0))
            float(jnp.sum(frame))
            intersect_mod.QUERY_LOG = None
            rays_frame2 = sum(e["rays"] for e in qlog2) or rays_frame
            t0 = time.perf_counter()
            for f in range(1, n_frames + 1):
                frame, st = step(sc, cam2, cfg, rng.make_frame_seed(0, f),
                                 st, jnp.asarray(f))
            float(jnp.sum(frame))
            dt2 = time.perf_counter() - t0
            extras.append(
                f"{label} {rays_frame2 * n_frames / dt2 / 1e6:.1f}"
                f" (rpp {rays_frame2 / float(WIDTH * HEIGHT):.1f})")
        except Exception as e:  # noqa: BLE001 — secondary metric only
            extras.append(f"{label} failed:{type(e).__name__}")

    # 1M-triangle scale proof, fully isolated in a subprocess with a hard
    # timeout so a hang or compile failure can never cost the main metric
    try:
        import os
        import subprocess
        import sys
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools", "bench_terrain1m.py")],
            capture_output=True, text=True, timeout=1500)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("TERRAIN1M")), None)
        if line:
            parts = line.split()
            extras.append(f"terrain1M {parts[1]} (rpp {parts[3]})")
        else:
            extras.append(f"terrain1M failed:rc{r.returncode}")
    except Exception as e:  # noqa: BLE001
        extras.append(f"terrain1M failed:{type(e).__name__}")

    baseline_mrays = 2.0  # reference CPU fwd (BASELINE.md derived throughput)
    print(json.dumps({
        "metric": "restir_1080p_mrays_per_s_fwd_bwd",
        "value": round(mrays_fwd_bwd, 2),
        "unit": ("Mrays/s (fwd " + str(round(mrays_fwd, 1))
                 + "; " + "; ".join(extras)
                 + f"; rpp {traced_rpp:.1f} traced/"
                 + f"{rays_per_pixel(cfg)} analytic)"),
        "vs_baseline": round(mrays_fwd_bwd / baseline_mrays, 2),
    }))


if __name__ == "__main__":
    main()
