"""Packet-cluster intersection: the production large-scene backend.

TPU-first replacement for Embree's BVH traversal (reference
pg/Intersection.h:8-113, pg/Scene.cpp:15 rtcCommitScene). Per-ray BVH
walks are scalar-divergent pointer-chasing — the worst program shape for
a dense vector machine (and, as round 2 showed, an XLA lockstep rewrite
of one compiles slowly and runs slower). This backend keeps every step
dense and statically shaped:

  Phase 1 — packet culling (VPU). Rays are grouped into fixed packets of
  P consecutive rays (spatially coherent: primary rays come in scanline
  order, shadow rays aim at the same light). Each packet is summarized by
  interval bounds (origin AABB, per-axis direction interval, [tnear,
  tfar] range) and conservatively slab-tested against every cluster AABB
  with interval arithmetic — one dense (packets, clusters) test, no
  traversal. Clusters are chunks of 128 triangles contiguous in BVH-leaf
  order (scene/scene.py), so their AABBs are tight.

  Phase 2 — shortlist rounds (fused VPU). Each packet enumerates its
  passing clusters in index order, K clusters per round; a round gathers
  the K clusters' triangle rows and runs the fused Möller-Trumbore test
  + running-min reduction (XLA fuses the whole chain, so per-pair
  intermediates never touch HBM — measured ~25G pair-tests/s on v5e,
  which beats the Woop/MXU matmul form whose K-dim-4 outputs are
  write-bandwidth-bound). Packets are cohort-sorted by workload and
  processed in shrinking-prefix segments with growing K, so a few
  grazing "straggler" packets don't stall the whole chunk; the done
  counters guarantee EVERY passing cluster is tested — correctness never
  depends on a shortlist budget.

All shapes are static, there are no per-lane gathers inside hot loops,
and the whole thing is plain XLA — fast to compile, robust at scale,
reverse-AD-wrapped by render.intersect with the detached-winner VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = np.float32(np.inf)
_BIG = np.float32(3.0e38)
_BARY_EPS = 1e-5   # watertight slack, matches kernels/woop.py
_N_SLICES = 8    # swept sub-box count per packet (see _packet_bounds)


def _packet_bounds(o, d, tnear, tfar, p):
    """(R,3) rays -> per-packet interval summaries; R must be Rp*p.

    Dead rays (tfar < tnear — chunk padding, or degenerate shadow
    segments — or non-finite origin/direction, e.g. normalize(0) NaNs
    from invalid shadow segments) are excluded from the hull so one bad
    ray can't blow a packet's interval open (or NaN-poison it, which
    would silently cull the whole packet)."""
    rp = o.shape[0] // p
    op = o.reshape(rp, p, 3)
    dp = d.reshape(rp, p, 3)
    live = ((tfar >= tnear).reshape(rp, p)
            & jnp.all(jnp.isfinite(op), axis=-1)
            & jnp.all(jnp.isfinite(dp), axis=-1))[..., None]
    omin = jnp.min(jnp.where(live, op, _INF), axis=1)
    omax = jnp.max(jnp.where(live, op, -_INF), axis=1)
    dmin = jnp.min(jnp.where(live, dp, _INF), axis=1)
    dmax = jnp.max(jnp.where(live, dp, -_INF), axis=1)
    live1 = live[..., 0]
    tn = jnp.min(jnp.where(live1, tnear.reshape(rp, p), _INF), axis=1)
    tf = jnp.max(jnp.where(live1, tfar.reshape(rp, p), -_INF), axis=1)
    # swept sub-box hulls for bounded packets (every live ray has finite
    # tfar — the bbox clamp guarantees this): slice each ray's [tnear,
    # tfar] span into _N_SLICES equal t-fractions and take the packet
    # hull of each slice. The union of slice boxes approximates the swept
    # frustum far more tightly than one end-to-end box — a long diagonal
    # shadow frustum (surface tile -> area light overhead) stops passing
    # every surface cluster under its bounding box.
    tnp = tnear.reshape(rp, p, 1)
    tfp = tfar.reshape(rp, p, 1)
    fracs = jnp.linspace(0.0, 1.0, _N_SLICES + 1)
    pts = op[:, :, None, :] + dp[:, :, None, :] * (
        tnp + (tfp - tnp) * fracs[None, None, :])[..., None]  # (Rp,P,S+1,3)
    live4 = live[:, :, None, :]
    pmin = jnp.min(jnp.where(live4, pts, _INF), axis=1)    # (Rp, S+1, 3)
    pmax = jnp.max(jnp.where(live4, pts, -_INF), axis=1)
    emin = jnp.minimum(pmin[:, :-1], pmin[:, 1:])          # (Rp, S, 3)
    emax = jnp.maximum(pmax[:, :-1], pmax[:, 1:])
    bounded = jnp.all(jnp.where(live1, jnp.isfinite(tfar).reshape(rp, p),
                                True), axis=1)
    return omin, omax, dmin, dmax, tn, tf, bounded, emin, emax


def _interval_pass(omin, omax, dmin, dmax, tnmin, tfmax, cmin, cmax):
    """Conservative packet-vs-cluster slab test.

    Packets (Rp, 3) interval bounds x clusters (C, 3) AABBs -> (Rp, C)
    bool: False only when NO ray in the packet's interval hull can hit
    the cluster within [tnmin, tfmax]. Interval division: when the
    direction interval spans zero the axis is unconstrained (t in
    [-inf, inf]); otherwise the quotient bounds come from the four
    corner products with the reciprocal interval.
    """
    rp = omin.shape[0]
    c = cmin.shape[0]
    entry_lo = jnp.full((rp, c), -_BIG)
    exit_hi = jnp.full((rp, c), _BIG)
    for a in range(3):
        dlo = dmin[:, a:a + 1]
        dhi = dmax[:, a:a + 1]
        # treat near-zero direction components as spanning zero so the
        # reciprocal can't overflow f32 (overflow -> inf/NaN corners ->
        # a true hit silently culled)
        spans0 = (dlo <= 1e-12) & (dhi >= -1e-12)        # (Rp, 1)
        safe_lo = jnp.where(spans0, 1.0, dlo)
        safe_hi = jnp.where(spans0, 1.0, dhi)
        rlo = jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi)  # (Rp, 1)
        rhi = jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi)
        rlo = jnp.clip(rlo, -1e12, 1e12)
        rhi = jnp.clip(rhi, -1e12, 1e12)
        # numerator intervals for both slab planes
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
        # entry = min(t1, t2), exit = max(t1, t2) pointwise
        a_entry_lo = jnp.minimum(t1lo, t2lo)
        a_exit_hi = jnp.maximum(t1hi, t2hi)
        a_entry_lo = jnp.where(spans0, -_BIG, a_entry_lo)
        a_exit_hi = jnp.where(spans0, _BIG, a_exit_hi)
        entry_lo = jnp.maximum(entry_lo, a_entry_lo)
        exit_hi = jnp.minimum(exit_hi, a_exit_hi)
    return ((entry_lo <= exit_hi)
            & (exit_hi >= tnmin[:, None])
            & (entry_lo <= tfmax[:, None]))


def _mt_rows(o, d, v0, e1, e2, tnear, tfar):
    """Möller-Trumbore, packet-batched: rays (Rp, P, 3) x gathered
    triangle rows (Rp, B, 3) -> t, u, v, ok of shape (Rp, P, B).

    Elementwise op sequence matches intersect._mt_block so fcluster hits
    reproduce the brute backend bit-for-bit; everything fuses with the
    running-min reduction (no materialized matmul outputs — this is why
    the MT/VPU form beats the Woop/MXU form here: K-dim-4 matmuls are
    output-bandwidth-bound)."""
    o = o[:, :, None, :]
    d = d[:, :, None, :]
    v0 = v0[:, None, :, :]
    e1 = e1[:, None, :, :]
    e2 = e2[:, None, :, :]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    ok_det = jnp.abs(det) > 1e-18
    inv = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    tv = o - v0
    u = jnp.sum(tv * p, axis=-1) * inv
    q = jnp.cross(tv, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    ok = ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (t >= tnear[..., None]) & (t <= tfar[..., None])
    return t, u, v, ok


def _round_select(passes, rank, done, k):
    """The next k unprocessed passing clusters per packet (processed
    count so far = done): -> (Rp, k) int32 sel (clamped) + valid mask.
    One top_k instead of k argmin scans, so k can grow per segment
    without blowing up the HLO."""
    rp, c = passes.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rp, c), 1)
    key = jnp.where(passes & (rank >= done[:, None]), iota, jnp.int32(c))
    neg, _idx = jax.lax.top_k(-key, k)       # k smallest keys
    sel = -neg
    valid = sel < c
    return jnp.minimum(sel, c - 1), valid


def _min_update_tri(carry, t, u, v, ok, cand_tri):
    """Fold (Rp, P, B) candidates into the (Rp, P) running min, where the
    candidate triangle ids vary per (packet, slot): cand_tri (Rp, B)."""
    bt, bu, bv, btri = carry
    tt = jnp.where(ok, t, _INF)
    tmin = jnp.min(tt, axis=-1)
    iota = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 2)
    jwin = jnp.min(jnp.where(tt <= tmin[..., None], iota,
                             jnp.int32(1 << 30)), axis=-1)
    onehot = iota == jwin[..., None]
    mu = jnp.sum(jnp.where(onehot, u, 0.0), axis=-1)
    mv = jnp.sum(jnp.where(onehot, v, 0.0), axis=-1)
    mtri = jnp.sum(jnp.where(onehot, cand_tri[:, None, :], 0), axis=-1)
    better = tmin < bt
    return (jnp.where(better, tmin, bt), jnp.where(better, mu, bu),
            jnp.where(better, mv, bv),
            jnp.where(better, mtri.astype(jnp.int32), btri))


def _prep(o, d, tnear, tfar, cmin, cmax, p):
    """Shared phase-1 work: packet bounds, pass matrix, ranks, rounds."""
    (omin, omax, dmin, dmax, tn, tf,
     bounded, emin, emax) = _packet_bounds(o, d, tnear, tfar, p)
    passes = _interval_pass(omin, omax, dmin, dmax, tn, tf, cmin, cmax)
    # (Rp, C, S): cluster vs each swept slice box; pass if ANY overlaps
    box_ok = jnp.any(
        jnp.all((emin[:, None, :, :] <= cmax[None, :, None, :])
                & (emax[:, None, :, :] >= cmin[None, :, None, :]),
                axis=-1), axis=-1)
    passes &= box_ok | ~bounded[:, None]
    rank = jnp.cumsum(passes.astype(jnp.int32), axis=1) - passes
    n_pass = rank[:, -1] + passes[:, -1]
    return passes, rank, n_pass


def _clamp_tfar_bbox(o, d, tnear, tfar, lo, hi):
    """Clamp tfar to the scene-bbox exit (all triangles live inside, so
    nothing can be hit beyond it). Every ray then becomes a bounded
    segment — the endpoint-box cull applies universally — and rays that
    miss the bbox entirely (sky) die up front (tfar < tnear)."""
    d_safe = jnp.where(jnp.abs(d) > 1e-20, d,
                       jnp.where(d >= 0.0, 1e-20, -1e-20))
    inv = 1.0 / d_safe
    t1 = (lo[None, :] - o) * inv
    t2 = (hi[None, :] - o) * inv
    ten = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tex = jnp.min(jnp.maximum(t1, t2), axis=-1)
    # f32 slack so the clamp can't shave a true boundary hit
    tex = tex * (1.0 + 1e-5) + 1e-5
    alive = (ten <= tex) & (tex >= tnear)
    return jnp.where(alive, jnp.minimum(tfar, tex), tnear - 1.0)


def _bin_rays(o, d, lo, hi):
    """Stable spatial-directional binning permutation for a ray chunk:
    origin cell (3 bits/axis over the scene bbox) then quantized
    direction (2 bits/axis). Already-coherent ray streams keep their
    order (stable sort of equal keys); incoherent streams (BRDF bounce
    rays) become packet-coherent. Returns (order, inverse)."""
    ext = jnp.maximum(hi - lo, 1e-9)
    oc = jnp.clip(((o - lo[None, :]) / ext[None, :] * 8.0).astype(jnp.int32),
                  0, 7)
    dq = jnp.clip(((d * 0.5 + 0.5) * 4.0).astype(jnp.int32), 0, 3)
    key = ((((oc[:, 0] << 3) | oc[:, 1]) << 3 | oc[:, 2]) << 6) \
        | (dq[:, 0] << 4) | (dq[:, 1] << 2) | dq[:, 2]
    key = jnp.where(jnp.all(jnp.isfinite(o) & jnp.isfinite(d), axis=-1),
                    key, jnp.int32(1 << 16))
    order = jnp.argsort(key, stable=True)
    n = order.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


def _segment_sizes(rp: int, n_segments: int = 3, shrink: int = 8):
    """Static prefix sizes for the cohort schedule: [Rp, Rp/8, Rp/64].

    Packets are sorted by descending n_pass, so busy packets form a
    prefix. Segment i runs the round loop over prefix [0, S_i) until the
    first packet OUTSIDE the next prefix is exhausted; later segments
    keep iterating on ever-smaller prefixes. Stragglers (a few grazing
    packets that pass 10-100x more clusters than the median — measured
    on the terrain scene) then cost S_last * rounds instead of
    Rp * rounds."""
    sizes = []
    s = rp
    for _ in range(n_segments):
        sizes.append(max(s, 1))
        s //= shrink
        if sizes[-1] == 1:
            break
    return sizes


def _round_step(passes, rank, op, dp, tn, tf, v0b, e1b, e2b,
                block, kk, done):
    """One shortlist round over a packet prefix: select the next kk
    unprocessed clusters, gather their triangle rows and run the fused
    MT test. Returns (t, u, v, ok, cand_tri)."""
    rp = op.shape[0]
    sel, valid = _round_select(passes, rank, done, kk)     # (Rp, kk)
    v0 = v0b[sel].reshape(rp, kk * block, 3)
    e1 = e1b[sel].reshape(rp, kk * block, 3)
    e2 = e2b[sel].reshape(rp, kk * block, 3)
    t, u, v, ok = _mt_rows(op, dp, v0, e1, e2, tn, tf)     # (Rp, P, kk*B)
    ok &= jnp.repeat(valid, block, axis=1)[:, None, :]
    loc = jax.lax.broadcasted_iota(jnp.int32, (1, kk, block), 2)
    cand = (sel[:, :, None] * block + loc).reshape(rp, kk * block)
    return t, u, v, ok, cand


def fcluster_closest(o, d, tnear, tfar, v0b, e1b, e2b, cmin, cmax,
                     p: int = 256, k: int = 8, bin_rays: bool = False):
    """Closest hit over one ray chunk. v0b/e1b/e2b: (C, B, 3) triangle
    rows blocked per cluster (render.intersect._pad_tris layout); returns
    (t, u, v, tri) with t=inf / tri=-1 on miss. Triangle ids are
    cluster*B + offset (= global ids in the leaf-contiguous order)."""
    r = o.shape[0]
    rp = r // p
    c = cmin.shape[0]
    block = v0b.shape[1]
    kk = min(k, c)
    lo = jnp.min(cmin, axis=0)
    hi = jnp.max(cmax, axis=0)
    tnear = jnp.broadcast_to(tnear, (r,))
    tfar = _clamp_tfar_bbox(o, d, tnear, jnp.broadcast_to(tfar, (r,)),
                            lo, hi)
    if bin_rays:
        border, binv = _bin_rays(o, d, lo, hi)
        o, d, tnear, tfar = o[border], d[border], tnear[border], tfar[border]
    passes, rank, n_pass = _prep(o, d, tnear, tfar, cmin, cmax, p)

    # cohort sort: busiest packets first
    order = jnp.argsort(-n_pass)
    inv = jnp.argsort(order)
    passes = passes[order]
    rank = rank[order]
    n_pass = n_pass[order]

    op = o.reshape(rp, p, 3)[order]
    dp = d.reshape(rp, p, 3)[order]
    tn = tnear.reshape(rp, p)[order]
    tf = tfar.reshape(rp, p)[order]

    carry = (jnp.full((rp, p), _INF), jnp.zeros((rp, p)),
             jnp.zeros((rp, p)), jnp.full((rp, p), -1, jnp.int32))
    done = jnp.zeros((rp,), jnp.int32)

    sizes = _segment_sizes(rp)
    for i, s in enumerate(sizes):
        # straggler segments shrink 8x in packets but grow 4x in
        # clusters-per-round: few grazing packets then finish in a couple
        # of wide rounds instead of dozens of narrow ones
        kseg = min(kk * 4 ** i, c)
        s_next = sizes[i + 1] if i + 1 < len(sizes) else 0
        pre = tuple(x[:s] for x in carry) + (done[:s],)

        def cond(cst, s=s, s_next=s_next):
            dn = cst[-1]
            return jnp.any(n_pass[s_next:s] > dn[s_next:s])

        def body(cst, s=s, kseg=kseg):
            bt, bu, bv, btri, dn = cst
            t, u, v, ok, cand = _round_step(
                passes[:s], rank[:s], op[:s], dp[:s], tn[:s], tf[:s],
                v0b, e1b, e2b, block, kseg, dn)
            bt, bu, bv, btri = _min_update_tri((bt, bu, bv, btri),
                                               t, u, v, ok, cand)
            return bt, bu, bv, btri, dn + kseg

        pre = jax.lax.while_loop(cond, body, pre)
        carry = tuple(x.at[:s].set(xp) for x, xp in zip(carry, pre[:-1]))
        done = done.at[:s].set(pre[-1])

    bt, bu, bv, btri = (x[inv].reshape(-1) for x in carry)
    if bin_rays:
        bt, bu, bv, btri = bt[binv], bu[binv], bv[binv], btri[binv]
    return bt, bu, bv, btri


def fcluster_any(o, d, tnear, tfar, v0b, e1b, e2b, cmin, cmax,
                 p: int = 256, k: int = 8, bin_rays: bool = False):
    """Any-hit (occlusion) over one ray chunk -> (R,) bool. Early-exits
    each segment once every ray in the prefix is occluded."""
    r = o.shape[0]
    rp = r // p
    c = cmin.shape[0]
    block = v0b.shape[1]
    kk = min(k, c)
    lo = jnp.min(cmin, axis=0)
    hi = jnp.max(cmax, axis=0)
    tnear = jnp.broadcast_to(tnear, (r,))
    tfar = _clamp_tfar_bbox(o, d, tnear, jnp.broadcast_to(tfar, (r,)),
                            lo, hi)
    if bin_rays:
        border, binv = _bin_rays(o, d, lo, hi)
        o, d, tnear, tfar = o[border], d[border], tnear[border], tfar[border]
    passes, rank, n_pass = _prep(o, d, tnear, tfar, cmin, cmax, p)

    order = jnp.argsort(-n_pass)
    inv = jnp.argsort(order)
    passes = passes[order]
    rank = rank[order]
    n_pass = n_pass[order]

    op = o.reshape(rp, p, 3)[order]
    dp = d.reshape(rp, p, 3)[order]
    tn = tnear.reshape(rp, p)[order]
    tf = tfar.reshape(rp, p)[order]

    occ = jnp.zeros((rp, p), bool)
    done = jnp.zeros((rp,), jnp.int32)

    sizes = _segment_sizes(rp)
    for i, s in enumerate(sizes):
        kseg = min(kk * 4 ** i, c)
        s_next = sizes[i + 1] if i + 1 < len(sizes) else 0
        pre = (occ[:s], done[:s])

        def cond(cst, s=s, s_next=s_next):
            _occp, dn = cst
            return jnp.any(n_pass[s_next:s] > dn[s_next:s])

        def body(cst, s=s, kseg=kseg):
            occp, dn = cst
            _t, _u, _v, ok, _cand = _round_step(
                passes[:s], rank[:s], op[:s], dp[:s], tn[:s], tf[:s],
                v0b, e1b, e2b, block, kseg, dn)
            occp = occp | jnp.any(ok, axis=-1)
            # fully-occluded packets are done: drop them from the cond
            dn = jnp.maximum(dn + kseg,
                             jnp.where(jnp.all(occp, axis=-1),
                                       n_pass[:s], 0))
            return occp, dn

        pre = jax.lax.while_loop(cond, body, pre)
        occ = occ.at[:s].set(pre[0])
        done = done.at[:s].set(pre[1])

    occ = occ[inv].reshape(-1)
    if bin_rays:
        occ = occ[binv]
    return occ
