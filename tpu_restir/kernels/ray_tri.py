"""Pallas TPU kernels: fused ray x triangle intersection (small scenes).

The XLA formulation of the Embree-replacement queries (kernels/woop.py
matmuls + masked reductions) materializes (rays, tris) intermediates in
HBM; for the per-p_hat occlusion queries that make ReSTIR's shading math
(pg/ReSTIRIntegrator.cpp:180-211) this traffic dominates. These kernels
keep the whole test in VMEM/registers:

  * rays are tiled channels-first as (8, TILE//128, 128) blocks — TILE
    rays per grid step (one (TILE//128, 128) VPU block per channel);
  * the per-triangle Woop transform rows live in SMEM and broadcast as
    scalars into vector math (~35 VPU ops per triangle per TILE rays,
    zero intermediate HBM traffic);
  * any-hit ORs into an occlusion mask; closest-hit keeps a running
    (t, u, v, tri) min in registers (reference rtcOccluded1 /
    rtcIntersect1 semantics, pg/Intersection.h:8-113).

Best for scenes up to a few thousand triangles (all BASELINE scenes);
larger scenes go through the cluster-culling backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = np.float32(np.inf)
_BARY_EPS = 1e-5   # watertight slack, matches kernels/woop.py
# Rays per grid step. Round 2 used one (8, 128) VPU tile (1024 rays) per
# step; at 2M-ray production chunks that is ~2k grid steps whose per-step
# overhead dominated (measured 71 Mrays/s at 36 tris — ~4% of VPU peak).
# 8192 rays/step = (64, 128) blocks amortizes it 8x; VMEM cost is
# 8 ch x 64 x 128 x 4 B = 256 KiB in + small accumulators, well under
# the ~16 MiB budget. Tradeoff: every query pads up to a TILE multiple,
# so small batches (low-res debug renders, per-sample probes) do up to
# 8x wasted work — acceptable because production queries are 2M+ rays
# and supports() routes small SCENES (not small batches) elsewhere; if
# small-batch latency ever matters, pick _ROWS adaptively from n.
TILE = 8192
_ROWS = TILE // 128  # sublane rows per grid step

# Test hook: run the Mosaic kernels in the Pallas interpreter (CPU) so the
# suite can check them against the XLA backends without TPU hardware.
INTERPRET = False


def _woop_tuvok(rays, w, t_idx):
    """One triangle's (t, u, v, ok) over an (8, _ROWS, 128) ray block.

    rays: ref (8, _ROWS, 128) — channels ox,oy,oz,dx,dy,dz,tnear,tfar.
    w: SMEM ref (T, 12) — rows of the 3x4 Woop matrix (u, v, w rows).
    """
    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    tn, tf = rays[6], rays[7]

    def aff(c):   # transformed origin component (row c) with translation
        return (ox * w[t_idx, 4 * c] + oy * w[t_idx, 4 * c + 1]
                + oz * w[t_idx, 4 * c + 2] + w[t_idx, 4 * c + 3])

    def lin(c):   # transformed direction component (row c)
        return (dx * w[t_idx, 4 * c] + dy * w[t_idx, 4 * c + 1]
                + dz * w[t_idx, 4 * c + 2])

    ow, dw = aff(2), lin(2)
    t = jnp.where(jnp.abs(dw) > 1e-18, -ow / dw, _INF)
    u = aff(0) + t * lin(0)
    v = aff(1) + t * lin(1)
    ok = ((u >= -_BARY_EPS) & (v >= -_BARY_EPS)
          & (u + v <= 1.0 + _BARY_EPS) & jnp.isfinite(t)
          & (t >= tn) & (t <= tf))
    return t, u, v, ok


# Triangle-loop strategy: a straight fori_loop (round 2) costs a Mosaic
# loop-carried dependency per triangle and lost ~30% forward throughput
# at 1080p vs round 1's full unroll; a full unroll is O(scene) program
# size. Hybrid: unroll completely up to _UNROLL_MAX triangles (covers
# every BASELINE scene on the fused path), else run a fori_loop whose
# body handles _UNROLL_W triangles (w rows padded to a multiple).
_UNROLL_MAX = 128
_UNROLL_W = 8


def _any_kernel(rays_ref, w_ref, out_ref, *, n_tris):
    # the accumulator is f32, not bool — Mosaic cannot legalize an
    # i1-vector loop carry
    if n_tris <= _UNROLL_MAX:
        occ = jnp.zeros((_ROWS, 128), jnp.float32)
        for t_idx in range(n_tris):
            _t, _u, _v, ok = _woop_tuvok(rays_ref, w_ref, t_idx)
            occ = jnp.maximum(occ, ok.astype(jnp.float32))
        out_ref[:] = occ
        return

    def body(i, occ):
        for j in range(_UNROLL_W):
            _t, _u, _v, ok = _woop_tuvok(rays_ref, w_ref,
                                         i * _UNROLL_W + j)
            occ = jnp.maximum(occ, ok.astype(jnp.float32))
        return occ

    occ = jax.lax.fori_loop(0, -(-n_tris // _UNROLL_W), body,
                            jnp.zeros((_ROWS, 128), jnp.float32))
    out_ref[:] = occ


def _closest_kernel(rays_ref, w_ref, out_ref, *, n_tris):
    def step(t_idx, carry):
        bt, bu, bv, btri = carry
        t, u, v, ok = _woop_tuvok(rays_ref, w_ref, t_idx)
        better = ok & (t < bt)
        return (jnp.where(better, t, bt), jnp.where(better, u, bu),
                jnp.where(better, v, bv),
                jnp.where(better,
                          jnp.float32(t_idx) if isinstance(t_idx, int)
                          else t_idx.astype(jnp.float32), btri))

    init = (jnp.full((_ROWS, 128), _INF),
            jnp.zeros((_ROWS, 128), jnp.float32),
            jnp.zeros((_ROWS, 128), jnp.float32),
            jnp.full((_ROWS, 128), -1.0))
    if n_tris <= _UNROLL_MAX:
        carry = init
        for t_idx in range(n_tris):
            carry = step(t_idx, carry)
    else:
        def body(i, carry):
            for j in range(_UNROLL_W):
                carry = step(i * _UNROLL_W + j, carry)
            return carry

        carry = jax.lax.fori_loop(0, -(-n_tris // _UNROLL_W), body, init)
    bt, bu, bv, btri = carry
    out_ref[0] = jnp.where(btri >= 0.0, bt, _INF)
    out_ref[1] = bu
    out_ref[2] = bv
    out_ref[3] = btri


def _pack_rays(o, d, tnear, tfar):
    """(N, 3) SoA -> (8, nt*_ROWS, 128) channels-first blocks, padded to
    a TILE multiple (nt = number of grid steps)."""
    n = o.shape[0]
    nt = -(-n // TILE)
    pad = nt * TILE - n
    ch = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                    tnear, tfar], axis=0)                    # (8, N)
    if pad:
        # padded rays: tfar < tnear => never hit
        fill = jnp.zeros((8, pad), ch.dtype).at[7].set(-1.0)
        ch = jnp.concatenate([ch, fill], axis=1)
    return ch.reshape(8, nt * _ROWS, 128), nt, n


def _woop_rows(scene):
    w = scene.woop.reshape(scene.num_tris, 12)
    n = w.shape[0]
    if n > _UNROLL_MAX and n % _UNROLL_W:
        # pad to the unroll width with never-hit rows (u/v translation
        # inf -> the barycentric test always fails)
        pad = _UNROLL_W - n % _UNROLL_W
        filler = jnp.zeros((pad, 12), w.dtype)
        filler = filler.at[:, 3].set(jnp.inf).at[:, 7].set(jnp.inf)
        w = jnp.concatenate([w, filler], axis=0)
    return w


def _any_core_impl(w, o, d, tnear, tfar):
    rays, nt, n = _pack_rays(o, d, tnear, tfar)
    out = pl.pallas_call(
        functools.partial(_any_kernel, n_tris=w.shape[0]),
        interpret=INTERPRET,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, _ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * _ROWS, 128), jnp.float32),
    )(rays, w)
    return out.reshape(-1)[:n] > 0.5


@jax.custom_vjp
def _any_core(w, o, d, tnear, tfar):
    return _any_core_impl(w, o, d, tnear, tfar)


def _any_fwd(w, o, d, tnear, tfar):
    return _any_core_impl(w, o, d, tnear, tfar), (
        w.shape, o.shape, d.shape, tnear.shape, tfar.shape)


def _any_bwd(res, _g):
    # boolean visibility is detached (the reference estimator treats V
    # as data); cotangents are zero
    ws, os_, ds, tns, tfs = res
    return (jnp.zeros(ws), jnp.zeros(os_), jnp.zeros(ds),
            jnp.zeros(tns), jnp.zeros(tfs))


_any_core.defvjp(_any_fwd, _any_bwd)


def any_hit(scene, o, d, tnear, tfar) -> jnp.ndarray:
    """Occlusion query: True where any triangle blocks [tnear, tfar].
    Detached for autodiff."""
    return _any_core(_woop_rows(scene), o, d, tnear, tfar)


def _closest_core_impl(w, o, d, tnear, tfar):
    rays, nt, n = _pack_rays(o, d, tnear, tfar)
    out = pl.pallas_call(
        functools.partial(_closest_kernel, n_tris=w.shape[0]),
        interpret=INTERPRET,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, _ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, _ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, nt * _ROWS, 128), jnp.float32),
    )(rays, w)
    flat = out.reshape(4, -1)[:, :n]
    tri = flat[3].astype(jnp.int32)
    return flat[0], flat[1], flat[2], tri


@jax.custom_vjp
def _closest_core(w, o, d, tnear, tfar):
    return _closest_core_impl(w, o, d, tnear, tfar)


def _closest_fwd(w, o, d, tnear, tfar):
    out = _closest_core_impl(w, o, d, tnear, tfar)
    t, _u, _v, tri = out
    return out, (w, d, t, tri, tnear.shape, tfar.shape)


def _closest_bwd(res, g):
    """Analytic d(t,u,v)/d(o,d) for the (detached) winning triangle.

    With W the winner's Woop rows (w_u, w_v, w_w | translations):
      t = -(w_w.o + c_w) / (w_w.d)
      u = (w_u.o + c_u) + t (w_u.d),   v likewise with w_v,
    so with L_x = w_x.d and a = (gt + gu L_u + gv L_v)/L_w:
      dL/do = gu w_u + gv w_v - a w_w,   dL/dd = t * dL/do.
    Geometry (w) is treated as data.
    """
    from tpu_restir import mathx

    w, d, t, tri, tns, tfs = res
    gt, gu, gv, _gtri = g
    rows = mathx.take_rows(w, jnp.maximum(tri, 0))   # (N, 12)
    wu = rows[:, 0:3]
    wv = rows[:, 4:7]
    ww = rows[:, 8:11]
    lw = jnp.sum(ww * d, axis=-1)
    lu = jnp.sum(wu * d, axis=-1)
    lv = jnp.sum(wv * d, axis=-1)
    inv_lw = jnp.where(jnp.abs(lw) > 1e-18, 1.0 / lw, 0.0)
    live = ((tri >= 0) & jnp.isfinite(t)).astype(jnp.float32)
    tt = jnp.where(jnp.isfinite(t), t, 0.0)
    a = (gu * lu + gv * lv + gt) * inv_lw * live
    go = (gu * live)[:, None] * wu + (gv * live)[:, None] * wv \
        - a[:, None] * ww
    gd = tt[:, None] * go
    return (jnp.zeros_like(w), go, gd, jnp.zeros(tns), jnp.zeros(tfs))


_closest_core.defvjp(_closest_fwd, _closest_bwd)


def closest_hit(scene, o, d, tnear, tfar):
    """Closest-hit query -> (t, u, v, tri) flat arrays (tri = -1 on miss).

    Differentiable in (o, d) via the analytic derivative of the winning
    triangle's Woop transform (the discrete winner is detached, standard
    for hit-point derivatives); scene geometry is treated as data."""
    return _closest_core(_woop_rows(scene), o, d, tnear, tfar)


def supports(scene, max_tris: int = 512) -> bool:
    """Kernel applicability: Woop matrices present, small scene."""
    return scene.woop is not None and scene.num_tris <= max_tris
