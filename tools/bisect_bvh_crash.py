"""Bisect the terrain100k wide-BVH TPU crash (VERDICT round-2 weak #1).

Runs bvh8_closest directly (no ReSTIR) on the terrain scene over varying
(n_tris, ray_count) and reports ok/fail per cell, to isolate what faults
the TPU kernel: stack size, ray chunk size, or scene size.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.scene.procedural import terrain_scene
from tpu_restir.accel.wide import bvh8_closest


def make_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([0.0, -7.0, 4.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5  # aim down at terrain
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def run_cell(scene, n_rays):
    o, d = make_rays(n_rays)
    tn = jnp.full((n_rays,), 0.01, jnp.float32)
    tf = jnp.full((n_rays,), 1e30, jnp.float32)
    fn = jax.jit(lambda o, d, tn, tf: bvh8_closest(
        scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, tn, tf))
    t0 = time.perf_counter()
    bt, bu, bv, btri = fn(o, d, tn, tf)
    nh = int(jnp.sum(btri >= 0))
    dt = time.perf_counter() - t0
    return nh, dt


def main():
    tri_counts = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                                   else ["20000", "100000"])]
    ray_counts = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                                   else ["4096", "65536", "262144"])]
    for nt in tri_counts:
        scene = terrain_scene(nt)
        print(f"scene {nt}: tris={scene.num_tris} "
              f"bvh={'yes' if scene.bvh is not None else 'no'} "
              f"depth={scene.bvh.max_depth if scene.bvh is not None else '-'} "
              f"max_leaf={scene.bvh.max_leaf if scene.bvh is not None else '-'} "
              f"nodes={scene.bvh.boxes.shape[0] if scene.bvh is not None else '-'}",
              flush=True)
        if scene.bvh is None:
            continue
        for nr in ray_counts:
            try:
                nh, dt = run_cell(scene, nr)
                print(f"  rays={nr}: ok hits={nh} t={dt:.2f}s", flush=True)
            except Exception as e:
                print(f"  rays={nr}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
