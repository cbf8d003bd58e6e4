"""Micro-benchmarks for ptrace phase-1 alternatives on terrain100k@1080p."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.accel.fcluster import _clamp_tfar_bbox, _packet_bounds
from tpu_restir.config import CameraConfig
from tpu_restir.kernels import cluster_trace as ct
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.intersect import _tile_perm
from tpu_restir.scene.procedural import terrain_scene

W, H = 1920, 1080


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / reps, out


def main():
    scene = terrain_scene(100_000)
    n = W * H
    cam_cfg = CameraConfig(width=W, height=H, fov_y_deg=45.0,
                           view_from=(0.0, -7.0, 4.0),
                           view_at=(0.0, 0.0, 0.5))
    cam = cam_mod.make_camera(cam_cfg)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    o, d = cam_mod.generate_rays_at(cam, cam_cfg, jnp.uint32(1), ys, xs)
    perm = _tile_perm(H, W)
    o = o.reshape(-1, 3)[perm]
    d = d.reshape(-1, 3)[perm]
    tn = jnp.full((n,), 0.01, jnp.float32)
    tf = jnp.full((n,), 1e30, jnp.float32)
    cmin, cmax = scene.cluster_min, scene.cluster_max
    lo = jnp.min(cmin, axis=0)
    hi = jnp.max(cmax, axis=0)

    @jax.jit
    def mkkey(o, d, tn, tf):
        tfc = _clamp_tfar_bbox(o, d, tn, tf, lo, hi)
        (omin, omax, dmin, dmax, tnp, tfp, bounded, emin,
         emax) = _packet_bounds(o, d, tn, tfc, ct.P)
        passes, entry = ct._interval_pass_entry(
            omin, omax, dmin, dmax, tnp, tfp, cmin, cmax)
        box_ok = jnp.any(
            jnp.all((emin[:, None, :, :] <= cmax[None, :, None, :])
                    & (emax[:, None, :, :] >= cmin[None, :, None, :]),
                    axis=-1), axis=-1)
        passes &= box_ok | ~bounded[:, None]
        key = jnp.where(passes, jnp.maximum(entry, tnp[:, None]),
                        jnp.float32(np.inf))
        cnt = jnp.sum(passes.astype(jnp.int32), axis=1)
        return key, cnt

    dt_key, (key, cnt) = timeit(mkkey, o, d, tn, tf)
    print(f"key build (bounds+interval+box): {dt_key*1e3:.1f} ms", flush=True)

    rp, c = key.shape

    @jax.jit
    def full_sort(key):
        iota = jax.lax.broadcasted_iota(jnp.int32, (rp, c), 1)
        return jax.lax.sort((key, iota), dimension=1, num_keys=1)

    dt, _ = timeit(full_sort, key)
    print(f"full sort (8100x{c}): {dt*1e3:.1f} ms", flush=True)

    for k in (32, 64):
        @jax.jit
        def topk_sort(key, k=k):
            neg, idx = jax.lax.top_k(-key, k)       # k smallest keys
            sk, sl = jax.lax.sort((-neg, idx), dimension=1, num_keys=1)
            return sk, sl

        dt, _ = timeit(topk_sort, key)
        print(f"top_k({k}) + small sort: {dt*1e3:.1f} ms", flush=True)

    # reduction-based compaction: rank via cumsum, select per slot
    for maxsl in (32,):
        @jax.jit
        def red_compact(key, maxsl=maxsl):
            passes = jnp.isfinite(key)
            rank = jnp.cumsum(passes.astype(jnp.int32), axis=1) - passes
            iota = jax.lax.broadcasted_iota(jnp.int32, (rp, c), 1)
            sls = []
            for r in range(maxsl):
                m = passes & (rank == r)
                sls.append(jnp.max(jnp.where(m, iota, -1), axis=1))
            sl = jnp.stack(sls, axis=1)
            ent = jnp.take_along_axis(key, jnp.maximum(sl, 0), axis=1)
            return sl, ent

        dt, _ = timeit(red_compact, key)
        print(f"reduction compact ({maxsl}): {dt*1e3:.1f} ms "
              "(index order, unsorted)", flush=True)

    # interval pass alone on precomputed bounds (materialized inputs)
    tfc = jax.jit(lambda: _clamp_tfar_bbox(o, d, tn, tf, lo, hi))()
    pb = jax.jit(lambda: _packet_bounds(o, d, tn, tfc, ct.P))()
    pb = jax.tree.map(jnp.asarray, pb)

    @jax.jit
    def ipass(pb):
        omin, omax, dmin, dmax, tnp, tfp, bounded, emin, emax = pb
        return ct._interval_pass_entry(omin, omax, dmin, dmax, tnp, tfp,
                                       cmin, cmax)

    dt, _ = timeit(ipass, pb)
    print(f"interval pass alone: {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def boxok(pb):
        *_, emin, emax = pb
        return jnp.any(
            jnp.all((emin[:, None, :, :] <= cmax[None, :, None, :])
                    & (emax[:, None, :, :] >= cmin[None, :, None, :]),
                    axis=-1), axis=-1)

    dt, _ = timeit(boxok, pb)
    print(f"box_ok alone: {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def bounds_only(o, d, tn, tf):
        tfc = _clamp_tfar_bbox(o, d, tn, tf, lo, hi)
        out = _packet_bounds(o, d, tn, tfc, ct.P)
        # reduce to avoid fetching big arrays
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out)

    dt, _ = timeit(bounds_only, o, d, tn, tf)
    print(f"bounds alone (reduced): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
