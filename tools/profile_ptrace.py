"""Phase-level profile of the ptrace backend on terrain100k@1080p."""

import time

import jax
import jax.numpy as jnp
import numpy as np

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

    from tpu_restir.accel.fcluster import _clamp_tfar_bbox

    @jax.jit
    def phase1(o, d, tn, tf):
        lo = jnp.min(cmin, axis=0)
        hi = jnp.max(cmax, axis=0)
        tfc = _clamp_tfar_bbox(o, d, tn, tf, lo, hi)
        return ct.build_shortlists(o, d, tn, tfc, cmin, cmax)

    dt, (cnt, sl, ent) = timeit(phase1, o, d, tn, tf)
    cnts = np.asarray(cnt)
    print(f"phase1: {dt*1e3:.1f} ms | count mean={cnts.mean():.1f} "
          f"p50={np.percentile(cnts,50):.0f} p95={np.percentile(cnts,95):.0f}"
          f" p99={np.percentile(cnts,99):.0f} max={cnts.max()}", flush=True)

    # full closest
    @jax.jit
    def full(o, d, tn, tf):
        return ct.trace_closest(scene.cluster_tris, cmin, cmax, o, d, tn, tf)

    dt_full, out = timeit(full, o, d, tn, tf)
    print(f"closest full: {dt_full*1e3:.1f} ms "
          f"(kernel ~{(dt_full-dt)*1e3:.1f} ms)", flush=True)

    # simulate ordered early-exit: per packet, rounds = #shortlist entries
    # until entry > max_r min(best_t, tfar) using the TRUE best_t
    t_best = np.asarray(out[0]).reshape(-1, ct.P)
    tfc = np.asarray(jax.jit(lambda: _clamp_tfar_bbox(
        o, d, tn, tf, jnp.min(cmin, 0), jnp.max(cmax, 0)))()).reshape(
        -1, ct.P)
    maxt = np.minimum(t_best, tfc).max(axis=1)
    ent_np = np.asarray(ent)
    rounds = (ent_np <= maxt[:, None]).sum(axis=1)
    rounds = np.minimum(rounds, cnts)
    print(f"effective rounds (ordered, final watermark): mean="
          f"{rounds.mean():.2f} p95={np.percentile(rounds,95):.0f} "
          f"max={rounds.max()} | total={rounds.sum()}", flush=True)

    # subcomponents of phase1
    from tpu_restir.accel.fcluster import _packet_bounds

    @jax.jit
    def p1_bounds(o, d, tn, tf):
        lo = jnp.min(cmin, axis=0)
        hi = jnp.max(cmax, axis=0)
        tfc = _clamp_tfar_bbox(o, d, tn, tf, lo, hi)
        return _packet_bounds(o, d, tn, tfc, ct.P)

    dtb, pb = timeit(p1_bounds, o, d, tn, tf)
    print(f"  bounds: {dtb*1e3:.1f} ms", flush=True)

    @jax.jit
    def p1_pass(o, d, tn, tf):
        lo = jnp.min(cmin, axis=0)
        hi = jnp.max(cmax, axis=0)
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
        return passes, entry

    dtp, _ = timeit(p1_pass, o, d, tn, tf)
    print(f"  bounds+interval: {dtp*1e3:.1f} ms (sort ~{(dt-dtp)*1e3:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
