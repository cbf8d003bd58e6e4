"""Pallas TPU kernel: packet-shortlist cluster traversal ("ptrace").

The production large-scene intersection backend (the framework's Embree
replacement at scale — reference pg/Intersection.h:8-113, pg/Scene.cpp:15
rtcCommitScene). Round 3's fcluster backend kept everything in plain XLA
with lockstep while_loop "shortlist rounds" over shrinking packet
prefixes; measured on terrain100k@1080p that design compiled in ~8 min
and traced 1.8 Mrays/s — every packet in a prefix pays for the busiest
packet's rounds, and each round re-runs top_k selection. This kernel
keeps the dense-culling idea but makes the per-packet work exact:

  Phase 1 (XLA, dense): rays are grouped into packets of P=256
  (spatially coherent 8x32 pixel tiles via render.intersect's swizzle).
  Each packet's interval hull is slab-tested against every cluster AABB
  in one dense (Rp, C) op (tpu_restir.accel.fcluster interval
  arithmetic + swept sub-box culling), producing a conservative entry
  distance per passing pair. ONE sort per packet orders the passing
  clusters front-to-back -> a per-packet shortlist + count.

  Phase 2 (Pallas, grid over packets): each packet loops over exactly
  its own shortlist — no lockstep. Cluster triangle blocks (B tris,
  channels-last (B, 16) tiles) are double-buffer DMA'd HBM->VMEM while
  the previous cluster's fused Möller-Trumbore test runs on a (B, P)
  VPU tile. Closest-hit carries a packet-wide watermark
  max_r(min(best_t_r, tfar_r)) and stops as soon as the next cluster's
  entry distance exceeds it (ordered traversal — the TPU analog of
  Embree's near-child-first BVH descent); any-hit stops when every live
  ray is occluded.

Round-5 additions (measured A/B record: docs/PERF_NOTES.md):

  SUPERCLUSTERS: scenes beyond SUPER_MAX clusters group F consecutive
  leaf-order clusters per shortlist entry so the (G, S) SMEM shortlists
  stay bounded at any scene size; the kernel expands each entry into F
  cluster slots (terrain at 1e6 tris: C=15.7k, F=4, S=3.9k).

  PER-RAY CULLS (SKIP_MODE): before a cluster slot's MT tile, a
  per-ray slab test against its AABB (SMEM (8, C) table) combined with
  the per-ray upper bound min(best_t, tfar) / not-yet-occluded can skip
  the slot. The skip bitmask is computed one round AHEAD and carried as
  a scalar (mode 5), so dead slots skip their DMA too and the
  vector->scalar reduction latency overlaps live MT work — inline
  `pl.when(jnp.any(live))` per slot measured SLOWER than no culling at
  all. Production: any-hit culls (shadow packets union divergent
  per-pixel light targets — 689 listed vs 230 live pairs/ray);
  closest-hit does not (the watermark already exploits the order).

All control flow is a single scalar-carried while_loop per packet; the
vector state (running min / occlusion mask) lives in the output refs.
Compiles in seconds (vs minutes for the XLA formulation) because the
program is one small kernel, not an unrolled segment schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = np.float32(np.inf)
_BIGI = np.int32(1 << 30)

P = 256  # rays per packet == one 8x32 pixel tile
G = 8    # packets per grid step (amortizes per-step overhead; also the
         # minimum SMEM block sublane count the TPU lowering accepts)
G_SMALL = 32  # small scenes (C <= SMALL_C) amortize the per-step
              # pipeline overhead over 4x the packets — their rounds are
              # so short that step setup is a visible frame fraction

# Maximum shortlist width S: phase-1 shortlists and entry distances live
# in SMEM as (G, S) blocks, so S must be bounded regardless of scene
# size. Scenes with more than SUPER_MAX clusters group F = ceil(C /
# SUPER_MAX) consecutive leaf-order clusters into one SUPERCLUSTER (a
# contiguous triangle range, so its AABB is tight); phase 1 culls and
# orders superclusters, and the kernel expands each shortlist entry into
# its F cluster blocks. At F = 1 (every scene up to ~131k tris at B=64)
# this is bit-identical to the flat scheme. SMEM at S=4096:
# 2 x (8, 4096) x 4 B shortlists + the (8, <=BOX_MAX) box table.
# 4096 measured better than 2048 at 1M tris (F=4 vs F=8: 16.1 -> 17.6
# Mrays/s — finer shortlists waste fewer forced expansions).
SUPER_MAX = 4096

# Test hook: run the Mosaic kernels in the Pallas interpreter (CPU) so the
# suite can check them against the XLA backends without TPU hardware.
INTERPRET = False

# Per-ray cull mode (perf A/B, read at trace time):
#  -1 = round-4 behavior: one fused MT over the whole round tile, no cull
#   0 = no per-ray cull (per-h split only)
#   1 = slab cull with upper = tfar (no best_t dependency)
#   2 = slab cull tightened by the running best_t (closest-hit only)
#   3 = round-granular cull: OR the pair live-masks, ONE scalar sync per
#       round, skip the whole fused round when no ray lives
#   5 = mode-4 culls whose bitmask is computed one round AHEAD and
#       carried as a scalar: dead slots skip their DMA too, and the
#       reduction latency overlaps live MT work
# SKIP_MODE = None uses the per-kernel defaults below (terrain100k
# amortized A/B, docs/PERF_NOTES.md): closest-hit culls only ~9% of
# listed clusters (the watermark already exploits front-to-back order),
# so any cull mode LOSES to the plain split there; any-hit culls ~67%
# (shadow packets union divergent per-pixel light targets) and mode 5
# converts that into 50.0 -> 36.9 ms. Setting an int forces both.
SKIP_MODE = None
SKIP_CLOSEST = 0
SKIP_ANY = 5

# Cluster-granular slab-cull boxes fit SMEM up to this cluster count
# (the (8, C) f32 table costs ~32 B/cluster of the ~1 MB budget next to
# the (G, S) shortlists — 501 KB + 262 KB compiles at C=15.7k/S=3917);
# above it the cull falls back to supercluster boxes (coarser — mostly
# useless at factor > 1, but SMEM-safe).
BOX_MAX = 16_000

# Scenes at or below this cluster count run without per-ray culls:
# their packets traverse only 1-5 rounds, where the cull's extra
# vector->scalar syncs cost more than the rounds they save. The
# early-outs STAY on even for tiny scenes — measured on lights1k
# (C=17): disabling the all-occluded exit dropped the frame 117 -> 71
# Mrays/s (most shadow rays occlude in round 1 in a closed scene).
SMALL_C = 64


# ---------------------------------------------------------------------------
# Phase 1: dense packet-vs-cluster culling with entry distances (XLA)
# ---------------------------------------------------------------------------

def _interval_pass_entry(omin, omax, dmin, dmax, tnmin, tfmax, cmin, cmax):
    """Conservative packet-vs-cluster slab test with entry distance.

    Same interval arithmetic as accel.fcluster._interval_pass, but also
    returns entry_lo (Rp, C): a lower bound on the t at which ANY ray in
    the packet's hull can enter the cluster. Used to order shortlists
    front-to-back and early-out closest-hit traversal.
    """
    big = np.float32(3.0e38)
    rp = omin.shape[0]
    c = cmin.shape[0]
    entry_lo = jnp.full((rp, c), -big)
    exit_hi = jnp.full((rp, c), big)
    for a in range(3):
        dlo = dmin[:, a:a + 1]
        dhi = dmax[:, a:a + 1]
        spans0 = (dlo <= 1e-12) & (dhi >= -1e-12)
        safe_lo = jnp.where(spans0, 1.0, dlo)
        safe_hi = jnp.where(spans0, 1.0, dhi)
        rlo = jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi)
        rhi = jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi)
        rlo = jnp.clip(rlo, -1e12, 1e12)
        rhi = jnp.clip(rhi, -1e12, 1e12)
        for plane, (blo_n, bhi_n) in enumerate((
                (cmin[None, :, a] - omax[:, a:a + 1],
                 cmin[None, :, a] - omin[:, a:a + 1]),
                (cmax[None, :, a] - omax[:, a:a + 1],
                 cmax[None, :, a] - omin[:, a:a + 1]))):
            q1 = blo_n * rlo
            q2 = blo_n * rhi
            q3 = bhi_n * rlo
            q4 = bhi_n * rhi
            tlo = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
            thi = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
            if plane == 0:
                t1lo, t1hi = tlo, thi
            else:
                t2lo, t2hi = tlo, thi
        a_entry_lo = jnp.minimum(t1lo, t2lo)
        a_exit_hi = jnp.maximum(t1hi, t2hi)
        a_entry_lo = jnp.where(spans0, -big, a_entry_lo)
        a_exit_hi = jnp.where(spans0, big, a_exit_hi)
        entry_lo = jnp.maximum(entry_lo, a_entry_lo)
        exit_hi = jnp.minimum(exit_hi, a_exit_hi)
    passes = ((entry_lo <= exit_hi)
              & (exit_hi >= tnmin[:, None])
              & (entry_lo <= tfmax[:, None]))
    return passes, entry_lo


# Sub-packet refinement (measured DEAD END, kept off): slab-testing each
# 32-ray subgroup hull against the boxes culls almost nothing beyond the
# packet hull (terrain100k receipt: shadow 689 -> ~664 pairs/ray, primary
# ~0) — the spread that fattens a shadow packet's hull is per-PIXEL light
# targets, which one pixel row shares. Only exact per-ray tests help
# (689 -> 230); those run in the kernel (SKIP_MODE).
SUBGROUP_REFINE = False
SUBP = 32


def build_shortlists(o, d, tnear, tfar, cmin, cmax, p: int = P):
    """Rays (R, 3) -> per-packet front-to-back cluster shortlists.

    Returns (count (Rp,) int32, shortlist (Rp, C) int32, entry (Rp, C)
    f32 ascending; entries past count are +inf). Conservative: every
    cluster any packet ray could hit within [tnear, tfar] is listed.
    """
    from tpu_restir.accel.fcluster import _packet_bounds

    (omin, omax, dmin, dmax, tn, tf,
     bounded, emin, emax) = _packet_bounds(o, d, tnear, tfar, p)
    passes, entry = _interval_pass_entry(omin, omax, dmin, dmax, tn, tf,
                                         cmin, cmax)
    # swept sub-box cull (see fcluster._prep): cluster must overlap one
    # of the packet's t-sliced hull boxes
    box_ok = jnp.any(
        jnp.all((emin[:, None, :, :] <= cmax[None, :, None, :])
                & (emax[:, None, :, :] >= cmin[None, :, None, :]),
                axis=-1), axis=-1)
    passes &= box_ok | ~bounded[:, None]
    if SUBGROUP_REFINE and p % SUBP == 0 and p > SUBP:
        from tpu_restir.accel.fcluster import _prep
        sub_pass, _rank, _n = _prep(o, d, tnear, tfar, cmin, cmax, SUBP)
        rp = passes.shape[0]
        passes &= jnp.any(sub_pass.reshape(rp, p // SUBP, -1), axis=1)
    key = jnp.where(passes, jnp.maximum(entry, tn[:, None]), _INF)
    rp, c = key.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rp, c), 1)
    ent_sorted, sl = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    count = jnp.sum(passes.astype(jnp.int32), axis=1)
    return count, sl, ent_sorted


# ---------------------------------------------------------------------------
# Phase 2: per-packet traversal kernels (Pallas)
# ---------------------------------------------------------------------------

def _ray_channels(rays_ref, g):
    """Split packet g of the (G, 8, P) ray block into (1, P) channels."""
    r = rays_ref[g]
    return (r[0:1, :], r[1:2, :], r[2:3, :], r[3:4, :], r[4:5, :],
            r[5:6, :], r[6:7, :], r[7:8, :])


def _mt_cluster(tr, ox, oy, oz, dx, dy, dz, tn, tf):
    """Fused Möller-Trumbore: one cluster's (B, 16) channel block against
    a (1, P) ray packet -> t, u, v, ok of shape (B, P). Op sequence
    mirrors render.intersect._mt_block so winning hits agree with the
    brute backend."""
    v0x, v0y, v0z = tr[:, 0:1], tr[:, 1:2], tr[:, 2:3]
    e1x, e1y, e1z = tr[:, 3:4], tr[:, 4:5], tr[:, 5:6]
    e2x, e2y, e2z = tr[:, 6:7], tr[:, 7:8], tr[:, 8:9]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok_det = jnp.abs(det) > 1e-18
    inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (t >= tn) & (t <= tf)
    return t, u, v, ok


# Clusters intersected per round share one loop iteration's control/DMA/
# reduction overhead; the compute tile is kept at (~TILE_ROWS, P) rows by
# packing 256//block clusters per round. A short tail duplicates the last
# cluster, which is result-neutral (the winner tie-break picks the lower
# row; duplicated any-hits OR into the same mask).
TILE_ROWS = 256


def _pair(block: int) -> int:
    return max(1, TILE_ROWS // block)


def _ray_inv(dx, dy, dz):
    """Safe per-ray reciprocal directions for the slab test: near-zero
    components clamp to +/-1e20 with the component's sign (same policy as
    accel.fcluster._clamp_tfar_bbox) so 0-component axes resolve to
    unconstrained [-big, big] intervals instead of NaNs."""
    def inv(c):
        ok = jnp.abs(c) > 1e-20
        return jnp.where(ok, 1.0 / jnp.where(ok, c, 1.0),
                         jnp.where(c >= 0.0, 1e20, -1e20))
    return inv(dx), inv(dy), inv(dz)


def _slab_entry_exit(box_ref, q, ox, oy, oz, ix, iy, iz, tn):
    """Per-ray slab test of (super)cluster AABB column q of the packed
    (8, S) SMEM box table against the packet's (1, P) ray channels.
    Returns (tent, texit) per ray, with tent clamped to >= tnear."""
    t1x = (box_ref[0, q] - ox) * ix
    t2x = (box_ref[3, q] - ox) * ix
    t1y = (box_ref[1, q] - oy) * iy
    t2y = (box_ref[4, q] - oy) * iy
    t1z = (box_ref[2, q] - oz) * iz
    t2z = (box_ref[5, q] - oz) * iz
    tent = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.maximum(jnp.minimum(t1z, t2z), tn))
    texit = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z))
    return tent, texit


def _slab_live(tent, texit, upper):
    """Conservative per-ray liveness: the ray's slab interval must be
    nonempty and start before `upper` (per-ray best-so-far / tfar).
    Relative + absolute slack so f32 rounding can't cull a true graze."""
    slack = 1e-4 * (jnp.abs(tent) + jnp.abs(texit)) + 1e-5
    return (tent <= texit + slack) & (tent - slack <= upper)


def _closest_kernel(cnt_ref, sl_ref, ent_ref, box_ref, rays_ref, ctris,
                    out_ref, buf, sem, *, block, n_clusters, n_super,
                    factor, pair, skip, early_out, box_cluster=True,
                    g_step=G):
    """Per-packet front-to-back traversal, closest hit.

    Shortlist entries are SUPERCLUSTERS (F = factor consecutive
    leaf-order clusters); slot s of the expanded cluster sequence maps to
    shortlist position s // F, cluster sl[s//F]*F + s%F.

    Per-ray culling (`skip`, see SKIP_MODE): each cluster slot can be
    slab-tested per ray against its supercluster AABB with the per-ray
    upper bound min(best_t, tfar) and skipped when no ray lives. Mode 5
    computes the next round's skip bitmask DURING the current round and
    carries it as a scalar, so dead slots skip their DMA as well as
    their compute — the vector->scalar reduction latency overlaps the
    live rounds' MT work instead of serializing the loop. Culling is
    conservative: upper bounds only shrink over rounds, so a slot dead
    at decision time stays dead. This is the TPU analog of Embree's
    per-ray BVH descent tightness on top of the packet-granular phase-1
    cull (reference rtcIntersect1, pg/Intersection.h:8-41)."""
    c_last = n_clusters - 1
    s_last = n_super - 1

    def packet(g, _):
        n = cnt_ref[g, 0]
        ox, oy, oz, dx, dy, dz, tn, tf = _ray_channels(rays_ref, g)
        if skip != 0:
            ix, iy, iz = _ray_inv(dx, dy, dz)
        ns = n * factor                   # expanded cluster slot count
        nr = (ns + pair - 1) // pair      # rounds of `pair` clusters

        def slot_q(jr, half):
            """Shortlist position for slot (jr, half), clamped valid."""
            s = jnp.maximum(jnp.minimum(pair * jr + half, ns - 1), 0)
            return jnp.minimum(s // factor, s_last) if factor > 1 \
                else jnp.minimum(s, s_last)

        def slot_cluster(jr, half):
            if factor == 1:
                return sl_ref[g, slot_q(jr, half)]
            s = jnp.maximum(jnp.minimum(pair * jr + half, ns - 1), 0)
            sc = sl_ref[g, slot_q(jr, half)]
            return jnp.minimum(sc * factor + jax.lax.rem(s, factor),
                               c_last)

        def dma(jr, half):
            slot = jax.lax.rem(jr, 2)
            return pltpu.make_async_copy(
                ctris.at[slot_cluster(jr, half)],
                buf.at[slot, pl.ds(half * block, block)],
                sem.at[slot, half])

        def slab_h(jr, h, upper):
            bi = slot_cluster(jr, h) if box_cluster \
                else sl_ref[g, slot_q(jr, h)]
            tent, texit = _slab_entry_exit(
                box_ref, bi, ox, oy, oz, ix, iy, iz, tn)
            return _slab_live(tent, texit, upper)

        def flags_for(jr):
            """Scalar bitmask: which of round jr's slots any ray lives in."""
            upper = jnp.minimum(out_ref[g, 0:1, :], tf)
            fl = jnp.int32(0)
            for h in range(pair):
                r = jnp.any(slab_h(jr, h, upper))
                fl = fl | (r.astype(jnp.int32) << h)
            return fl

        out_ref[g, 0:1, :] = jnp.full((1, P), _INF)
        out_ref[g, 1:2, :] = jnp.zeros((1, P), jnp.float32)
        out_ref[g, 2:3, :] = jnp.zeros((1, P), jnp.float32)
        out_ref[g, 3:4, :] = jnp.full((1, P), -1.0)

        if skip == 5:
            fl0 = flags_for(0)

            @pl.when(n > 0)
            def _():
                for h in range(pair):
                    @pl.when(((fl0 >> h) & 1) > 0)
                    def _(h=h):
                        dma(0, h).start()
        else:
            fl0 = jnp.int32(-1)

            @pl.when(n > 0)
            def _():
                for h in range(pair):
                    dma(0, h).start()

        # watermark: no ray can improve beyond min(best_t, its tfar), so
        # the packet is done once the next front-to-back entry passes it.
        # Small scenes (1-3 rounds/packet) disable it: the per-packet
        # jnp.max and per-round watermark reductions are vector->scalar
        # syncs that dominate the packet's cost there (lights1k floor).
        maxt0 = jnp.max(tf) if early_out else jnp.float32(0.0)

        def cond(carry):
            jr, maxt, _fl = carry
            if not early_out:
                return jr < nr
            ent = ent_ref[g, slot_q(jr, 0)]
            return (jr < nr) & (ent <= maxt)

        def fused_round(jr, slot):
            """One MT over the whole (pair*block, P) round tile."""
            tr = buf[slot]
            t, u, v, ok = _mt_cluster(tr, ox, oy, oz, dx, dy, dz,
                                      tn, tf)
            tt = jnp.where(ok, t, _INF)
            tmin = jnp.min(tt, axis=0, keepdims=True)            # (1, P)
            riota = jax.lax.broadcasted_iota(jnp.int32,
                                             (pair * block, P), 0)
            jwin = jnp.min(jnp.where(tt <= tmin, riota, _BIGI),
                           axis=0, keepdims=True)
            onehot = riota == jwin
            mu = jnp.sum(jnp.where(onehot, u, 0.0), axis=0,
                         keepdims=True)
            mv = jnp.sum(jnp.where(onehot, v, 0.0), axis=0,
                         keepdims=True)
            mtri = jnp.zeros((1, P), jnp.int32)
            for h in range(pair):
                in_h = (jwin >= h * block) & (jwin < (h + 1) * block)
                mtri = jnp.where(
                    in_h, slot_cluster(jr, h) * block
                    + jwin - h * block, mtri)
            mtri = mtri.astype(jnp.float32)
            bt = out_ref[g, 0:1, :]
            better = tmin < bt
            nt = jnp.where(better, tmin, bt)
            out_ref[g, 0:1, :] = nt
            out_ref[g, 1:2, :] = jnp.where(better, mu,
                                           out_ref[g, 1:2, :])
            out_ref[g, 2:3, :] = jnp.where(better, mv,
                                           out_ref[g, 2:3, :])
            out_ref[g, 3:4, :] = jnp.where(better, mtri,
                                           out_ref[g, 3:4, :])

        def mt_h(jr, h, slot):
            """One cluster slot's (B, P) MT test + running-min fold."""
            riota = jax.lax.broadcasted_iota(jnp.int32, (block, P), 0)
            tr = buf[slot, pl.ds(h * block, block)]          # (B, 128)
            t, u, v, ok = _mt_cluster(tr, ox, oy, oz, dx, dy, dz,
                                      tn, tf)
            tt = jnp.where(ok, t, _INF)
            tmin = jnp.min(tt, axis=0, keepdims=True)            # (1, P)
            jwin = jnp.min(jnp.where(tt <= tmin, riota, _BIGI),
                           axis=0, keepdims=True)
            onehot = riota == jwin
            mu = jnp.sum(jnp.where(onehot, u, 0.0), axis=0,
                         keepdims=True)
            mv = jnp.sum(jnp.where(onehot, v, 0.0), axis=0,
                         keepdims=True)
            mtri = (slot_cluster(jr, h) * block
                    + jwin).astype(jnp.float32)
            bt = out_ref[g, 0:1, :]
            better = tmin < bt
            out_ref[g, 0:1, :] = jnp.where(better, tmin, bt)
            out_ref[g, 1:2, :] = jnp.where(better, mu,
                                           out_ref[g, 1:2, :])
            out_ref[g, 2:3, :] = jnp.where(better, mv,
                                           out_ref[g, 2:3, :])
            out_ref[g, 3:4, :] = jnp.where(better, mtri,
                                           out_ref[g, 3:4, :])

        def body(carry):
            jr, _maxt, fl = carry
            slot = jax.lax.rem(jr, 2)

            if skip == 5:
                fln = flags_for(jr + 1)

                @pl.when(jr + 1 < nr)
                def _():
                    for h in range(pair):
                        @pl.when(((fln >> h) & 1) > 0)
                        def _(h=h):
                            dma(jr + 1, h).start()

                for h in range(pair):
                    @pl.when(((fl >> h) & 1) > 0)
                    def _(h=h, slot=slot, jr=jr):
                        dma(jr, h).wait()
                        mt_h(jr, h, slot)
                if not early_out:
                    return jr + 1, _maxt, fln
                nt = out_ref[g, 0:1, :]
                return jr + 1, jnp.max(jnp.minimum(nt, tf)), fln

            fln = fl

            @pl.when(jr + 1 < nr)
            def _():
                for h in range(pair):
                    dma(jr + 1, h).start()

            for h in range(pair):
                dma(jr, h).wait()
            if skip == -1:
                fused_round(jr, slot)
            elif skip == 3:
                upper = jnp.minimum(out_ref[g, 0:1, :], tf)
                live = slab_h(jr, 0, upper)
                for h in range(1, pair):
                    live = live | slab_h(jr, h, upper)

                @pl.when(jnp.any(live))
                def _(jr=jr, slot=slot):
                    fused_round(jr, slot)
            else:
                if skip == 4:
                    upper = jnp.minimum(out_ref[g, 0:1, :], tf)
                    runs = [jnp.any(slab_h(jr, h, upper))
                            for h in range(pair)]
                for h in range(pair):
                    if skip == 0:
                        run = jnp.bool_(True)
                    elif skip == 4:
                        run = runs[h]
                    else:
                        upper = tf if skip == 1 \
                            else jnp.minimum(out_ref[g, 0:1, :], tf)
                        run = jnp.any(slab_h(jr, h, upper))

                    @pl.when(run)
                    def _(h=h, slot=slot, jr=jr):
                        mt_h(jr, h, slot)
            if not early_out:
                return jr + 1, _maxt, fln
            nt = out_ref[g, 0:1, :]
            return jr + 1, jnp.max(jnp.minimum(nt, tf)), fln

        jf, _, flf = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), maxt0, fl0))

        # drain the prefetch issued for the round the early-out skipped
        @pl.when((n > 0) & (jf < nr))
        def _():
            for h in range(pair):
                if skip == 5:
                    @pl.when(((flf >> h) & 1) > 0)
                    def _(h=h):
                        dma(jf, h).wait()
                else:
                    dma(jf, h).wait()

        return 0

    jax.lax.fori_loop(0, g_step, packet, 0, unroll=False)


def _any_kernel(cnt_ref, sl_ref, ent_ref, box_ref, rays_ref, ctris,
                out_ref, buf, sem, *, block, n_clusters, n_super, factor,
                pair, skip, early_out, box_cluster=True, g_step=G):
    c_last = n_clusters - 1
    s_last = n_super - 1

    def packet(g, _):
        n = cnt_ref[g, 0]
        ox, oy, oz, dx, dy, dz, tn, tf = _ray_channels(rays_ref, g)
        if skip != 0:
            ix, iy, iz = _ray_inv(dx, dy, dz)
        ns = n * factor
        nr = (ns + pair - 1) // pair

        def slot_q(jr, half):
            s = jnp.maximum(jnp.minimum(pair * jr + half, ns - 1), 0)
            return jnp.minimum(s // factor, s_last) if factor > 1 \
                else jnp.minimum(s, s_last)

        def slot_cluster(jr, half):
            if factor == 1:
                return sl_ref[g, slot_q(jr, half)]
            s = jnp.maximum(jnp.minimum(pair * jr + half, ns - 1), 0)
            sc = sl_ref[g, slot_q(jr, half)]
            return jnp.minimum(sc * factor + jax.lax.rem(s, factor),
                               c_last)

        def dma(jr, half):
            slot = jax.lax.rem(jr, 2)
            return pltpu.make_async_copy(
                ctris.at[slot_cluster(jr, half)],
                buf.at[slot, pl.ds(half * block, block)],
                sem.at[slot, half])

        def slab_h(jr, h):
            bi = slot_cluster(jr, h) if box_cluster \
                else sl_ref[g, slot_q(jr, h)]
            tent, texit = _slab_entry_exit(
                box_ref, bi, ox, oy, oz, ix, iy, iz, tn)
            return _slab_live(tent, texit, tf)

        def flags_for(jr):
            notocc = out_ref[pl.ds(g, 1), :] < 0.5
            fl = jnp.int32(0)
            for h in range(pair):
                r = jnp.any(slab_h(jr, h) & notocc)
                fl = fl | (r.astype(jnp.int32) << h)
            return fl

        out_ref[pl.ds(g, 1), :] = jnp.zeros((1, P), jnp.float32)

        if skip == 5:
            fl0 = flags_for(0)

            @pl.when(n > 0)
            def _():
                for h in range(pair):
                    @pl.when(((fl0 >> h) & 1) > 0)
                    def _(h=h):
                        dma(0, h).start()
        else:
            fl0 = jnp.int32(-1)

            @pl.when(n > 0)
            def _():
                for h in range(pair):
                    dma(0, h).start()

        # dead rays (padding / degenerate shadow segments) count as done
        # so they can't hold the early-out open; their output stays 0.
        # Small scenes skip the all-occluded early-out entirely: its
        # per-round jnp.min reduction is a vector->scalar sync that
        # dominates 1-3-round packets (lights1k floor).
        deadf = (tf < tn).astype(jnp.float32) if early_out else None

        def cond(carry):
            jr, done, _fl = carry
            if not early_out:
                return jr < nr
            return (jr < nr) & (done < 0.5)

        def fused_round(slot):
            tr = buf[slot]
            _t, _u, _v, ok = _mt_cluster(tr, ox, oy, oz, dx, dy, dz,
                                         tn, tf)
            out_ref[pl.ds(g, 1), :] = jnp.maximum(
                out_ref[pl.ds(g, 1), :],
                jnp.max(ok.astype(jnp.float32), axis=0,
                        keepdims=True))

        def mt_h(h, slot):
            tr = buf[slot, pl.ds(h * block, block)]
            _t, _u, _v, ok = _mt_cluster(tr, ox, oy, oz,
                                         dx, dy, dz, tn, tf)
            out_ref[pl.ds(g, 1), :] = jnp.maximum(
                out_ref[pl.ds(g, 1), :],
                jnp.max(ok.astype(jnp.float32), axis=0,
                        keepdims=True))

        def body(carry):
            jr, _done, fl = carry
            slot = jax.lax.rem(jr, 2)

            if skip == 5:
                fln = flags_for(jr + 1)

                @pl.when(jr + 1 < nr)
                def _():
                    for h in range(pair):
                        @pl.when(((fln >> h) & 1) > 0)
                        def _(h=h):
                            dma(jr + 1, h).start()

                for h in range(pair):
                    @pl.when(((fl >> h) & 1) > 0)
                    def _(h=h, slot=slot, jr=jr):
                        dma(jr, h).wait()
                        mt_h(h, slot)
                if not early_out:
                    return jr + 1, _done, fln
                occ = out_ref[pl.ds(g, 1), :]
                return jr + 1, jnp.min(jnp.maximum(occ, deadf)), fln

            fln = fl

            @pl.when(jr + 1 < nr)
            def _():
                for h in range(pair):
                    dma(jr + 1, h).start()

            for h in range(pair):
                dma(jr, h).wait()
            if skip == -1:
                fused_round(slot)
            elif skip == 3:
                notocc = out_ref[pl.ds(g, 1), :] < 0.5
                live = slab_h(jr, 0)
                for h in range(1, pair):
                    live = live | slab_h(jr, h)
                live &= notocc

                @pl.when(jnp.any(live))
                def _(slot=slot):
                    fused_round(slot)
            else:
                if skip == 4:
                    notocc = out_ref[pl.ds(g, 1), :] < 0.5
                    runs = [jnp.any(slab_h(jr, h) & notocc)
                            for h in range(pair)]
                for h in range(pair):
                    if skip == 0:
                        run = jnp.bool_(True)
                    elif skip == 4:
                        run = runs[h]
                    else:
                        live = slab_h(jr, h)
                        if skip == 2:
                            live &= out_ref[pl.ds(g, 1), :] < 0.5
                        run = jnp.any(live)

                    @pl.when(run)
                    def _(h=h, slot=slot):
                        mt_h(h, slot)
            if not early_out:
                return jr + 1, _done, fln
            occ = out_ref[pl.ds(g, 1), :]
            return jr + 1, jnp.min(jnp.maximum(occ, deadf)), fln

        done0 = jnp.min(deadf) if early_out else jnp.float32(0.0)
        jf, _, flf = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), done0, fl0))

        @pl.when((n > 0) & (jf < nr))
        def _():
            for h in range(pair):
                if skip == 5:
                    @pl.when(((flf >> h) & 1) > 0)
                    def _(h=h):
                        dma(jf, h).wait()
                else:
                    dma(jf, h).wait()

        return 0

    jax.lax.fori_loop(0, g_step, packet, 0, unroll=False)


# ---------------------------------------------------------------------------
# MXU traversal kernels: Woop-transform intersection as two (P, 4) @
# (4, 3B*pair) matmuls per round. The fused MT form costs ~60 VPU ops
# per (ray, tri) pair; here the affine transforms (~44 of those ops)
# ride the otherwise-idle MXU and the VPU tail is ~16 ops on the
# component slices — measured ~2x faster rounds at B=128. Rays live on
# SUBLANES (o4/d4 are natural (P, 4) operands — no transposes anywhere).
# ---------------------------------------------------------------------------

_BARY_EPS = 1e-5  # watertight slack, matches kernels/woop.py


def _woop_round(o4, d4, tn, tf, w4, pair):
    """One round's transforms + hit tests: w4 (4, pair*3*_WCOMP) ->
    per-half (t, u, v, ok) lists, each (P, _WCOMP)."""
    # HIGHEST: the MXU's default bf16 rounding costs ~2% in t and ~0.03
    # in u/v — far beyond the watertight epsilon (measured false hits);
    # the multi-pass f32 product is exact and still a tiny fraction of
    # the round (K = 4).
    to = jnp.dot(o4, w4, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    td = jnp.dot(d4, w4, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    halves = []
    for h in range(pair):
        b = h * 3 * _WCOMP
        ou = to[:, b:b + _WCOMP]
        ov = to[:, b + _WCOMP:b + 2 * _WCOMP]
        ow = to[:, b + 2 * _WCOMP:b + 3 * _WCOMP]
        du = td[:, b:b + _WCOMP]
        dv = td[:, b + _WCOMP:b + 2 * _WCOMP]
        dw = td[:, b + 2 * _WCOMP:b + 3 * _WCOMP]
        t = jnp.where(jnp.abs(dw) > 1e-18, -ow / dw, _INF)
        u = ou + t * du
        v = ov + t * dv
        ok = ((u >= -_BARY_EPS) & (v >= -_BARY_EPS)
              & (u + v <= 1.0 + _BARY_EPS) & jnp.isfinite(t)
              & (t >= tn) & (t <= tf))
        halves.append((t, u, v, ok))
    return halves


def _closest_kernel_mxu(cnt_ref, sl_ref, ent_ref, o4_ref, d4_ref, tt_ref,
                        cwoop, out_ref, buf, sem, *, block, n_clusters,
                        pair):
    c_last = n_clusters - 1
    wl = 3 * _WCOMP

    def packet(g, _):
        n = cnt_ref[g, 0]
        o4 = o4_ref[g]                       # (P, 4)
        d4 = d4_ref[g]
        tt = tt_ref[g]
        tn = tt[:, 0:1]                      # (P, 1)
        tf = tt[:, 1:2]
        nr = (n + pair - 1) // pair

        def slh(jr, h):
            return sl_ref[g, jnp.minimum(
                jnp.minimum(pair * jr + h, n - 1), c_last)]

        def dma(jr, h):
            slot = jax.lax.rem(jr, 2)
            return pltpu.make_async_copy(
                cwoop.at[slh(jr, h)],
                buf.at[slot, :, pl.ds(h * wl, wl)],
                sem.at[slot, h])

        @pl.when(n > 0)
        def _():
            for h in range(pair):
                dma(0, h).start()

        bt0 = jnp.full((P, 1), _INF)
        z = jnp.zeros((P, 1))
        out_ref[pl.ds(g, 1)] = jnp.concatenate(
            [bt0, z, z, jnp.full((P, 1), -1.0)], axis=1)[None]
        maxt0 = jnp.max(tf)
        liota = jax.lax.broadcasted_iota(jnp.int32, (P, _WCOMP), 1)

        def cond(carry):
            jr, maxt = carry
            ent = ent_ref[g, jnp.minimum(pair * jr, c_last)]
            return (jr < nr) & (ent <= maxt)

        def body(carry):
            jr, _maxt = carry
            slot = jax.lax.rem(jr, 2)

            @pl.when(jr + 1 < nr)
            def _():
                for h in range(pair):
                    dma(jr + 1, h).start()

            for h in range(pair):
                dma(jr, h).wait()
            w4 = buf[slot, 0:4, :]
            cur = out_ref[g]                       # (P, 4)
            bt = cur[:, 0:1]
            bu = cur[:, 1:2]
            bv = cur[:, 2:3]
            btri = cur[:, 3:4]
            for h, (t, u, v, ok) in enumerate(
                    _woop_round(o4, d4, tn, tf, w4, pair)):
                tth = jnp.where(ok, t, _INF)
                tmin = jnp.min(tth, axis=1, keepdims=True)     # (P, 1)
                jwin = jnp.min(jnp.where(tth <= tmin, liota, _BIGI),
                               axis=1, keepdims=True)
                onehot = liota == jwin
                mu = jnp.sum(jnp.where(onehot, u, 0.0), axis=1,
                             keepdims=True)
                mv = jnp.sum(jnp.where(onehot, v, 0.0), axis=1,
                             keepdims=True)
                mtri = (slh(jr, h) * block + jwin).astype(jnp.float32)
                better = tmin < bt
                bt = jnp.where(better, tmin, bt)
                bu = jnp.where(better, mu, bu)
                bv = jnp.where(better, mv, bv)
                btri = jnp.where(better, mtri, btri)
            out_ref[pl.ds(g, 1)] = jnp.concatenate(
                [bt, bu, bv, btri], axis=1)[None]
            return jr + 1, jnp.max(jnp.minimum(bt, tf))

        jf, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), maxt0))

        @pl.when((n > 0) & (jf < nr))
        def _():
            for h in range(pair):
                dma(jf, h).wait()

        return 0

    jax.lax.fori_loop(0, G, packet, 0, unroll=False)


def _any_kernel_mxu(cnt_ref, sl_ref, ent_ref, o4_ref, d4_ref, tt_ref,
                    cwoop, out_ref, buf, sem, *, block, n_clusters, pair):
    c_last = n_clusters - 1
    wl = 3 * _WCOMP

    def packet(g, _):
        n = cnt_ref[g, 0]
        o4 = o4_ref[g]
        d4 = d4_ref[g]
        tt = tt_ref[g]
        tn = tt[:, 0:1]
        tf = tt[:, 1:2]
        nr = (n + pair - 1) // pair

        def slh(jr, h):
            return sl_ref[g, jnp.minimum(
                jnp.minimum(pair * jr + h, n - 1), c_last)]

        def dma(jr, h):
            slot = jax.lax.rem(jr, 2)
            return pltpu.make_async_copy(
                cwoop.at[slh(jr, h)],
                buf.at[slot, :, pl.ds(h * wl, wl)],
                sem.at[slot, h])

        @pl.when(n > 0)
        def _():
            for h in range(pair):
                dma(0, h).start()

        out_ref[pl.ds(g, 1)] = jnp.zeros((1, P, 1))
        deadf = (tf < tn).astype(jnp.float32)    # (P, 1)

        def cond(carry):
            jr, done = carry
            return (jr < nr) & (done < 0.5)

        def body(carry):
            jr, _done = carry
            slot = jax.lax.rem(jr, 2)

            @pl.when(jr + 1 < nr)
            def _():
                for h in range(pair):
                    dma(jr + 1, h).start()

            for h in range(pair):
                dma(jr, h).wait()
            w4 = buf[slot, 0:4, :]
            occ = out_ref[g]                     # (P, 1)
            for _h, (t, u, v, ok) in enumerate(
                    _woop_round(o4, d4, tn, tf, w4, pair)):
                occ = jnp.maximum(occ, jnp.max(ok.astype(jnp.float32),
                                               axis=1, keepdims=True))
            out_ref[pl.ds(g, 1)] = occ[None]
            return jr + 1, jnp.min(jnp.maximum(occ, deadf))

        jf, _ = jax.lax.while_loop(cond, body,
                                   (jnp.int32(0), jnp.min(deadf)))

        @pl.when((n > 0) & (jf < nr))
        def _():
            for h in range(pair):
                dma(jf, h).wait()

        return 0

    jax.lax.fori_loop(0, G, packet, 0, unroll=False)


# ---------------------------------------------------------------------------
# Wrappers: pad rays, run phase 1, launch the kernel
# ---------------------------------------------------------------------------

def _pack(o, d, tnear, tfar, scmin, scmax, bmin, bmax, g: int = G):
    """Clamp tfar to the scene bbox, pad to a grid-step multiple, build
    the (Rp, 8, P) channel blocks + phase-1 shortlists (against the
    supercluster AABBs scmin/scmax) + the packed (8, NB) SMEM box table
    for the in-kernel per-ray slab test (bmin/bmax: CLUSTER-granular
    when they fit SMEM, else the supercluster boxes — per-cluster
    granularity is what makes the cull effective at factor > 1)."""
    from tpu_restir.accel.fcluster import _clamp_tfar_bbox

    r = o.shape[0]
    lo = jnp.min(scmin, axis=0)
    hi = jnp.max(scmax, axis=0)
    tnear = jnp.broadcast_to(tnear, (r,))
    tfar = _clamp_tfar_bbox(o, d, tnear, jnp.broadcast_to(tfar, (r,)),
                            lo, hi)
    pad = (-r) % (g * P)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        tnear = jnp.concatenate([tnear, jnp.zeros((pad,), tnear.dtype)])
        tfar = jnp.concatenate([tfar, jnp.full((pad,), -1.0, tfar.dtype)])
    rp = (r + pad) // P
    cnt, sl, ent = build_shortlists(o, d, tnear, tfar, scmin, scmax, P)
    # (8, NB) layout — SMEM pads each ROW's minor dim to 512 B, so the
    # natural (NB, 8) table would cost NB x 512 B (~1 MB at NB=2048,
    # over the 1 MB SMEM budget); transposed it costs 8 x 4NB B.
    boxes = jnp.concatenate(
        [bmin.T, bmax.T, jnp.zeros((2, bmin.shape[0]), jnp.float32)],
        axis=0)                                               # (8, NB)
    rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1],
                      d[:, 2], tnear, tfar], axis=0)          # (8, R)
    rays = jnp.swapaxes(rays.reshape(8, rp, P), 0, 1)         # (Rp, 8, P)
    return rays, cnt.reshape(rp, 1), sl, ent, boxes, rp, r


def _pack_mxu(o, d, tnear, tfar, cmin, cmax):
    """Like _pack but emits the rays-on-sublane operands of the MXU
    kernels: o4/d4 (Rp, P, 4) homogeneous vectors + tt (Rp, P, 2)."""
    from tpu_restir.accel.fcluster import _clamp_tfar_bbox

    r = o.shape[0]
    lo = jnp.min(cmin, axis=0)
    hi = jnp.max(cmax, axis=0)
    tnear = jnp.broadcast_to(tnear, (r,))
    tfar = _clamp_tfar_bbox(o, d, tnear, jnp.broadcast_to(tfar, (r,)),
                            lo, hi)
    pad = (-r) % (G * P)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        tnear = jnp.concatenate([tnear, jnp.zeros((pad,), tnear.dtype)])
        tfar = jnp.concatenate([tfar, jnp.full((pad,), -1.0, tfar.dtype)])
    rp = (r + pad) // P
    cnt, sl, ent = build_shortlists(o, d, tnear, tfar, cmin, cmax, P)
    ones = jnp.ones((o.shape[0], 1), o.dtype)
    o4 = jnp.concatenate([o, ones], axis=1).reshape(rp, P, 4)
    d4 = jnp.concatenate([d, 0.0 * ones], axis=1).reshape(rp, P, 4)
    tt = jnp.stack([tnear, tfar], axis=1).reshape(rp, P, 2)
    return o4, d4, tt, cnt.reshape(rp, 1), sl, ent, rp, r


def _mxu_specs(c):
    return [
        pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((G, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((G, c), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((G, P, 4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, P, 4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, P, 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


def _trace_closest_mxu(cwoop, cmin, cmax, o, d, tnear, tfar, block):
    c = cwoop.shape[0]
    o4, d4, tt, cnt, sl, ent, rp, r = _pack_mxu(o, d, tnear, tfar,
                                                cmin, cmax)
    pair = _pair(block)
    out = pl.pallas_call(
        functools.partial(_closest_kernel_mxu, block=block, n_clusters=c,
                          pair=pair),
        interpret=INTERPRET,
        grid=(rp // G,),
        in_specs=_mxu_specs(c),
        out_specs=pl.BlockSpec((G, P, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, P, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, pair * 3 * _WCOMP), jnp.float32),
            pltpu.SemaphoreType.DMA((2, pair)),
        ],
    )(cnt, sl, ent, o4, d4, tt, cwoop)
    flat = out.reshape(rp * P, 4)[:r]
    return (flat[:, 0], flat[:, 1], flat[:, 2],
            flat[:, 3].astype(jnp.int32))


def _trace_any_mxu(cwoop, cmin, cmax, o, d, tnear, tfar, block):
    c = cwoop.shape[0]
    o4, d4, tt, cnt, sl, ent, rp, r = _pack_mxu(o, d, tnear, tfar,
                                                cmin, cmax)
    pair = _pair(block)
    out = pl.pallas_call(
        functools.partial(_any_kernel_mxu, block=block, n_clusters=c,
                          pair=pair),
        interpret=INTERPRET,
        grid=(rp // G,),
        in_specs=_mxu_specs(c),
        out_specs=pl.BlockSpec((G, P, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, P, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, pair * 3 * _WCOMP), jnp.float32),
            pltpu.SemaphoreType.DMA((2, pair)),
        ],
    )(cnt, sl, ent, o4, d4, tt, cwoop)
    return out.reshape(-1)[:r] > 0.5


def _super_boxes(cmin, cmax, factor: int):
    """Reduce cluster AABBs to supercluster AABBs over groups of
    `factor` consecutive leaf-order clusters (the last group pads by
    repeating the final cluster's box — result-neutral)."""
    if factor == 1:
        return cmin, cmax
    c = cmin.shape[0]
    s = -(-c // factor)
    pad = s * factor - c
    if pad:
        cmin = jnp.concatenate([cmin, jnp.repeat(cmin[-1:], pad, axis=0)])
        cmax = jnp.concatenate([cmax, jnp.repeat(cmax[-1:], pad, axis=0)])
    return (jnp.min(cmin.reshape(s, factor, 3), axis=1),
            jnp.max(cmax.reshape(s, factor, 3), axis=1))


def _skip_for(kind: str, c: int, factor: int = 1) -> int:
    if c <= SMALL_C:
        return 0
    if SKIP_MODE is not None:
        return SKIP_MODE
    if factor > 1 and c <= BOX_MAX:
        # per-cluster culls pay for themselves once every shortlist
        # entry expands to F cluster rounds (see BOX_MAX)
        return 5
    return SKIP_CLOSEST if kind == 'closest' else SKIP_ANY


def trace_closest(ctris, cmin, cmax, o, d, tnear, tfar, cwoop=None,
                  factor: int = 1):
    """Closest hit over flat rays (R, 3) -> (t, u, v, tri) with t=inf /
    tri=-1 on miss. ctris: (C, B, 128) cluster channel blocks (lanes 0-8 =
    v0/e1/e2 xyz; padding triangles have zero edges => det==0 => never
    hit). Triangle ids are cluster*B + row (global leaf-order ids).
    factor > 1 groups consecutive clusters into superclusters for the
    phase-1 shortlists (SMEM-bounded at any scene size; see SUPER_MAX).
    With cwoop (C, 8, 384) the MXU Woop kernel runs instead of the fused
    MT kernel (watertight-epsilon hit test, kernels/woop.py semantics)."""
    c, block, _ = ctris.shape
    if factor == 1:
        factor = pick_factor(c)   # auto: keep shortlists SMEM-bounded
    if cwoop is not None and block == _WCOMP and factor == 1:
        return _trace_closest_mxu(cwoop, cmin, cmax, o, d, tnear, tfar,
                                  block)
    scmin, scmax = _super_boxes(cmin, cmax, factor)
    s = scmin.shape[0]
    box_cluster = factor == 1 or c <= BOX_MAX
    bmin, bmax = (cmin, cmax) if box_cluster else (scmin, scmax)
    g = G_SMALL if c <= SMALL_C else G
    rays, cnt, sl, ent, boxes, rp, r = _pack(o, d, tnear, tfar,
                                             scmin, scmax, bmin, bmax, g)
    out = pl.pallas_call(
        functools.partial(_closest_kernel, block=block, n_clusters=c,
                          n_super=s, factor=factor, pair=_pair(block),
                          skip=_skip_for('closest', c, factor),
                          early_out=True, box_cluster=box_cluster,
                          g_step=g),
        interpret=INTERPRET,
        grid=(rp // g,),
        in_specs=[
            pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, boxes.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g, 4, P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 4, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _pair(block) * block, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _pair(block))),
        ],
    )(cnt, sl, ent, boxes, rays, ctris)
    flat = jnp.swapaxes(out, 0, 1).reshape(4, rp * P)[:, :r]
    return flat[0], flat[1], flat[2], flat[3].astype(jnp.int32)


def trace_any(ctris, cmin, cmax, o, d, tnear, tfar, cwoop=None,
              factor: int = 1):
    """Any-hit (occlusion) over flat rays (R, 3) -> (R,) bool."""
    c, block, _ = ctris.shape
    if factor == 1:
        factor = pick_factor(c)   # auto: keep shortlists SMEM-bounded
    if cwoop is not None and block == _WCOMP and factor == 1:
        return _trace_any_mxu(cwoop, cmin, cmax, o, d, tnear, tfar, block)
    scmin, scmax = _super_boxes(cmin, cmax, factor)
    s = scmin.shape[0]
    box_cluster = factor == 1 or c <= BOX_MAX
    bmin, bmax = (cmin, cmax) if box_cluster else (scmin, scmax)
    g = G_SMALL if c <= SMALL_C else G
    rays, cnt, sl, ent, boxes, rp, r = _pack(o, d, tnear, tfar,
                                             scmin, scmax, bmin, bmax, g)
    out = pl.pallas_call(
        functools.partial(_any_kernel, block=block, n_clusters=c,
                          n_super=s, factor=factor, pair=_pair(block),
                          skip=_skip_for('any', c, factor),
                          early_out=True, box_cluster=box_cluster,
                          g_step=g),
        interpret=INTERPRET,
        grid=(rp // g,),
        in_specs=[
            pl.BlockSpec((g, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, s), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, boxes.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((g, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((g, P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _pair(block) * block, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _pair(block))),
        ],
    )(cnt, sl, ent, boxes, rays, ctris)
    return out.reshape(-1)[:r] > 0.5


_WCOMP = 128  # lane width per Woop component block (u | v | w)


def build_cluster_woop(woop: np.ndarray, block: int) -> np.ndarray:
    """Per-triangle Woop matrices (N, 3, 4) (kernels/woop.py layout:
    rows u,v,w; column 3 translation) -> (C, 8, 3*_WCOMP) matmul blocks
    for the MXU traversal kernels.

    Rows 0-3 of a cluster block are the (4, 3B) operand of
    [o|1] @ W and [d|0] @ W: column comp*_WCOMP + tri holds
    woop[tri][comp, k] in row k<3 and the translation in row 3; rows 4-7
    pad the sublane tile. Requires block == _WCOMP so each component's
    column group is exactly one lane tile. Padding triangles are all-zero
    (d'w == 0 -> t = inf -> never hit)."""
    assert block == _WCOMP, (block, _WCOMP)
    n = woop.shape[0]
    c = -(-n // block)
    wp = np.zeros((c * block, 3, 4), np.float32)
    wp[:n] = woop
    # zero out the degenerate-marker inf translations: inf * 0 in the
    # matmul would NaN-poison whole rows; zero rows already never hit
    wp[~np.isfinite(wp).all(axis=(1, 2))] = 0.0
    wp = wp.reshape(c, block, 3, 4)
    out = np.zeros((c, 8, 3 * _WCOMP), np.float32)
    t = wp.transpose(0, 3, 2, 1)                 # (C, 4, 3, B)
    out[:, 0:4] = t.reshape(c, 4, 3 * block)
    return out


def build_cluster_tris(v: np.ndarray, block: int) -> np.ndarray:
    """Leaf-ordered triangle vertices (N, 3, 3) -> (C, B, 128) channel
    blocks for the traversal kernels. Channels 0-8 = v0/e1/e2 xyz; rest
    zero (the lane dim must be 128 — Mosaic pads HBM memrefs to the
    (·, 128) tile anyway, and DMA slices must be tile-aligned). Padding
    rows get zero edges (det == 0, never hit)."""
    n = v.shape[0]
    c = -(-n // block)
    out = np.zeros((c * block, 128), np.float32)
    out[:n, 0:3] = v[:, 0]
    out[:n, 3:6] = v[:, 1] - v[:, 0]
    out[:n, 6:9] = v[:, 2] - v[:, 0]
    return out.reshape(c, block, 128)


def pick_factor(n_clusters: int) -> int:
    """Supercluster grouping factor for a given cluster count: smallest
    F with ceil(C / F) <= SUPER_MAX (F = 1 up to ~131k tris at B=64)."""
    return -(-n_clusters // SUPER_MAX)


def supports(scene) -> bool:
    """Kernel applicability: cluster blocks present, TPU backend (the
    Mosaic kernel does not lower on CPU unless interpreting)."""
    return (getattr(scene, "cluster_tris", None) is not None
            and (jax.default_backend() != "cpu" or INTERPRET))
