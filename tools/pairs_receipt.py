"""Measured pairs-per-ray receipt for the ptrace backend (VERDICT r4
ask #1): how many (ray, triangle) tests the traversal performs per ray,
before and after the in-kernel per-ray slab cull, vs Embree's ~50
(reference rtcOccluded1, pg/Intersection.h:42-60).

Mirrors the kernel's skip rule in dense XLA: a cluster in a packet's
shortlist is TESTED iff >= 1 ray in the packet passes the per-ray slab
test against its (super)cluster AABB within [tnear, tfar]. No credit is
taken for the dynamic early-outs (closest-hit watermark / per-ray best_t
tightening, any-hit occlusion drop), so the number is an upper bound on
what the kernel actually tests.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/pairs_receipt.py [n_tris]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.config import CameraConfig
from tpu_restir.kernels.cluster_trace import (P, _super_boxes,
                                              build_shortlists, pick_factor)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.intersect import _tile_fold
from tpu_restir.scene.procedural import terrain_scene

W, H = 1920, 1080


def _per_ray_any_live(op, dp, tnp, tfp, scmin, scmax):
    """(Rp, P, ...) packet rays x (S, 3) boxes -> (Rp, S) bool: does any
    ray's slab interval intersect the box within [tnear, tfar]? Same
    safe-reciprocal + slack policy as the kernel."""
    ok = jnp.abs(dp) > 1e-20
    inv = jnp.where(ok, 1.0 / jnp.where(ok, dp, 1.0),
                    jnp.where(dp >= 0.0, 1e20, -1e20))       # (Rp, P, 3)
    t1 = (scmin[None, None] - op[:, :, None]) * inv[:, :, None]
    t2 = (scmax[None, None] - op[:, :, None]) * inv[:, :, None]
    tent = jnp.maximum(jnp.max(jnp.minimum(t1, t2), axis=-1),
                       tnp[:, :, None])
    texit = jnp.min(jnp.maximum(t1, t2), axis=-1)            # (Rp, P, S)
    slack = 1e-4 * (jnp.abs(tent) + jnp.abs(texit)) + 1e-5
    live = (tent <= texit + slack) & (tent - slack <= tfp[:, :, None])
    return jnp.any(live, axis=1)                             # (Rp, S)


def receipt(scene, o, d, tn, tf, label):
    from tpu_restir.accel.fcluster import _clamp_tfar_bbox

    c = scene.cluster_tris.shape[0]
    b = scene.cluster_tris.shape[1]
    f = pick_factor(c)
    scmin, scmax = _super_boxes(scene.cluster_min, scene.cluster_max, f)

    of = _tile_fold(o.reshape(-1, 3), H, W)
    df = _tile_fold(d.reshape(-1, 3), H, W)
    tnf = _tile_fold(jnp.broadcast_to(tn, (H, W)).reshape(-1), H, W)
    tff = _tile_fold(jnp.broadcast_to(tf, (H, W)).reshape(-1), H, W)
    r = of.shape[0]
    lo = jnp.min(scmin, axis=0)
    hi = jnp.max(scmax, axis=0)
    tff = _clamp_tfar_bbox(of, df, tnf, tff, lo, hi)

    cnt, sl, ent = build_shortlists(of, df, tnf, tff, scmin, scmax, P)
    rp = r // P

    @jax.jit
    def count():
        # shortlist membership as a dense (Rp, S) mask
        s = scmin.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (rp, s), 1)
        member = iota < cnt[:, None]
        member = jnp.zeros((rp, s), bool).at[
            jnp.arange(rp)[:, None], sl].max(member)
        op = of.reshape(rp, P, 3)
        dp = df.reshape(rp, P, 3)
        tnp = tnf.reshape(rp, P)
        tfp = tff.reshape(rp, P)

        def chunk(i, acc):
            # dynamic_slice clamps the start index, so the LAST chunk
            # re-reads a suffix window; mask duplicated packets so every
            # packet is counted exactly once
            start = jnp.minimum(i * 256, rp - 256)
            fresh = (start + jnp.arange(256) >= i * 256)[:, None]
            sel = jax.lax.dynamic_slice_in_dim(member, start, 256, 0) \
                & fresh
            alive = _per_ray_any_live(
                jax.lax.dynamic_slice_in_dim(op, start, 256, 0),
                jax.lax.dynamic_slice_in_dim(dp, start, 256, 0),
                jax.lax.dynamic_slice_in_dim(tnp, start, 256, 0),
                jax.lax.dynamic_slice_in_dim(tfp, start, 256, 0),
                scmin, scmax)
            pre = jnp.sum(sel.astype(jnp.int64))
            post = jnp.sum((sel & alive).astype(jnp.int64))
            return acc[0] + pre, acc[1] + post

        n_chunks = -(-rp // 256)
        pre, post = jax.lax.fori_loop(
            0, n_chunks, chunk,
            (jnp.int64(0), jnp.int64(0)))

        # (b) sub-packet hull refinement: 32-ray subgroup hulls (1 pixel
        # row of the 8x32 tile) instead of exact per-ray tests — the
        # phase-1-side alternative (shrinks shortlists, no kernel change)
        from tpu_restir.accel.fcluster import _prep
        sub_pass, _rank, _np_ = _prep(of, df, tnf, tff, scmin, scmax, 32)
        sub_any = jnp.any(sub_pass.reshape(rp, 8, -1), axis=1)
        mid = jnp.sum((member & sub_any).astype(jnp.int64))
        return pre, mid, post

    pre, mid, post = count()
    rows = f * b  # one shortlist entry = F cluster blocks of B rows
    pre_ppr = float(pre) * rows * P / r
    mid_ppr = float(mid) * rows * P / r
    post_ppr = float(post) * rows * P / r
    print(f"{label}: shortlisted pairs/ray {pre_ppr:.0f} -> "
          f"subhull32 {mid_ppr:.0f} -> per-ray cull {post_ppr:.0f} "
          f"(F={f}, B={b}, C={c})", flush=True)
    return pre_ppr, mid_ppr, post_ppr


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    t0 = time.time()
    scene = terrain_scene(n_tris)
    print(f"scene {scene.num_tris} tris ({time.time()-t0:.0f}s)",
          flush=True)
    cam_cfg = CameraConfig(width=W, height=H, fov_y_deg=45.0,
                           view_from=(0.0, -7.0, 4.0),
                           view_at=(0.0, 0.0, 0.5))
    cam = cam_mod.make_camera(cam_cfg)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    o, d = cam_mod.generate_rays_at(cam, cam_cfg, jnp.uint32(1), ys, xs)
    tn = jnp.full((H, W), 0.01, jnp.float32)
    receipt(scene, o, d, tn, jnp.full((H, W), 1e30), "primary closest")

    # shadow-like rays: surface points toward random sky-panel targets
    from tpu_restir.config import IntersectorConfig
    from tpu_restir.render.intersect import intersect_closest
    h = intersect_closest(scene, o, d, tn, jnp.full((H, W), 1e30),
                          IntersectorConfig(backend="ptrace"))
    hp = o + d * jnp.where(jnp.isfinite(h.t), h.t, 1.0)[..., None]
    rng_np = np.random.default_rng(5)
    tgt = np.stack([rng_np.uniform(-1.5, 1.5, (H, W)),
                    rng_np.uniform(-1.5, 1.5, (H, W)),
                    np.full((H, W), 6.6)], axis=-1).astype(np.float32)
    seg = jnp.asarray(tgt) - hp
    dist = jnp.linalg.norm(seg, axis=-1)
    sd = seg / jnp.maximum(dist, 1e-9)[..., None]
    receipt(scene, hp, sd, tn, dist - 1e-3, "shadow any")


if __name__ == "__main__":
    main()
