"""Pallas TPU kernel: bounded-radius per-pixel gather (neighbor taps).

ReSTIR spatial reuse reads, for every pixel, K neighbor payload rows at
per-pixel random offsets bounded by the reuse radius
(pg/ReSTIRIntegrator.cpp:334-341 picks disk neighbors of radius
sqrt(spatialReuseRadius) after the reference's r = sqrt(U(0,R)) quirk).
XLA lowers that to a generic gather that moves ~one element per cycle —
at 1080p x 5 taps x 32 channels that single op dominates the whole frame.

This kernel exploits the static offset bound R:
  * pad the image by PAD px so every tile's halo window exists and all
    in-window slice offsets are static (Mosaic requirement);
  * grid over (BR, BC) output tiles; DMA ONE (C, BR+2PAD, BC+128) halo
    window from HBM into VMEM per tile (channels-first so the lane
    dimension is image columns); all K taps share the fetch;
  * resolve X in-register with per-lane dynamic gathers
    (jnp.take_along_axis on one 128-lane vreg, twice + select because
    the 2R-wide source straddles two vregs), then select the row with
    2R+1 masked selects — dense VPU work, no HBM gather traffic;
  * per-tap lane indices/masks are hoisted out of the channel loop, and
    channels run under fori_loop so the unrolled kernel body stays small.

Offsets must be pre-clamped to the screen so every target lands inside
the window (the caller derives them from clamped absolute coordinates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 8     # output tile rows  (f32 sublane tile)
BC = 128   # output tile cols  (lane tile)
PAD = 8    # image padding == max supported offset radius

# Test hook: run the Mosaic kernels in the Pallas interpreter (CPU) so the
# suite can check them against the XLA fallback without TPU hardware.
INTERPRET = False

# Backward-path selector (measured at 1080p x 32ch x 5 taps: the Pallas
# scatter-transpose makes the full-frame fwd+bwd 2.4x faster than the
# XLA scatter-add transpose — 683 ms vs 1649 ms).
SCATTER_KERNEL = True


def _kernel(dy_ref, dx_ref, payload_hbm, out_ref, win, sem, *, r, k_taps,
            c_ch):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wr = BR + 2 * PAD          # 24 rows: multiple of the 8-sublane tile
    wc = BC + 128              # 256 cols: lane-tiling-aligned DMA slice

    # window [i*BR, i*BR + wr) x [j*BC, j*BC + wc) in PADDED coordinates
    # covers all targets: padded target = out pixel + PAD + offset with
    # |offset| <= r <= PAD, and the x padding is (PAD left, 128-PAD
    # right) so the window's lane start/extent stay 128-aligned
    dma = pltpu.make_async_copy(
        payload_hbm.at[:, pl.ds(i * BR, wr), pl.ds(j * BC, wc)], win, sem)
    dma.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
    # per-tap X-resolution lane indices: target window col = lane + PAD
    # + dx. The 2r-wide source range straddles the two 128-lane vregs of
    # a window row; gather from both and select. Hoisted out of the
    # channel loop.
    sel_a, idx_a, idx_b, dmask = [], [], [], []
    for k in range(k_taps):
        tcol = lane + (PAD + dx_ref[k])
        sel_a.append(tcol < 128)
        idx_a.append(jnp.clip(tcol, 0, 127))
        idx_b.append(jnp.clip(tcol - 128, 0, 127))
        dy = dy_ref[k]
        dmask.append([dy == (sy - r) for sy in range(2 * r + 1)])
    dma.wait()

    # channel loop is a fori (keeps the kernel body small); within it the
    # unaligned row loads are shared by all K taps. NOTE the gather must
    # run X-first (on a fixed source row) and row-select SECOND: the taps
    # are per-output-pixel, so a Y-select before the lane gather would be
    # masked at the post-gather columns (wrong pixel's dy). The per-tap
    # result accumulates in registers and stores once — the 2r+1 masked
    # stores per (channel, tap) of the round-1 kernel were half its cost.
    def body(c, _):
        accs = [None] * k_taps
        for sy in range(2 * r + 1):
            rs = PAD - r + sy                         # static row offset
            a = win[c, rs:rs + BR, 0:128]             # (BR, 128)
            b = win[c, rs:rs + BR, 128:256]
            for k in range(k_taps):
                g = jnp.where(sel_a[k],
                              jnp.take_along_axis(a, idx_a[k], axis=1),
                              jnp.take_along_axis(b, idx_b[k], axis=1))
                accs[k] = g if accs[k] is None else \
                    jnp.where(dmask[k][sy], g, accs[k])
        for k in range(k_taps):
            pltpu.store(out_ref.at[k, c], accs[k])
        return _

    jax.lax.fori_loop(0, c_ch, body, 0, unroll=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
@functools.partial(jax.jit, static_argnames=("r", "top", "disk_r2"))
def gather_local(payload: jnp.ndarray, tys: jnp.ndarray, txs: jnp.ndarray,
                 r: int, top: int = 0, disk_r2=None) -> jnp.ndarray:
    """payload (EH, W, C) f32, tap coords tys/txs (K, H, W) int32 in
    PAYLOAD coordinates with |tys - (pixel_row + top)| <= r <= PAD
    (pre-clamped). Returns (K, H, W, C) f32: payload[tys, txs, :].

    `top` (static) is the payload row where output row 0 sits — 0 for a
    same-shape payload, the halo width for a halo-extended strip
    (tpu_restir.dist.halo.extend_rows), so the sharded spatial pass keeps
    this kernel instead of falling back to an XLA gather.

    `disk_r2` (static, optional): when the offsets are known to satisfy
    dy^2 + dx^2 <= disk_r2 (disk-sampled neighbor taps), the backward
    scatter skips the impossible square-corner combos.

    Differentiable in payload (gather transpose = scatter-add; the
    Pallas scatter kernel serves the same-shape case, extended payloads
    take the XLA scatter-add transpose).
    """
    eh, w, c = payload.shape
    k, h = tys.shape[0], tys.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    dy = tys - (ys + top)
    dx = txs - xs

    pcf = jnp.transpose(payload, (2, 0, 1))          # (C, EH, W)
    # bring the payload into the kernel's padded frame: rows
    # [top - PAD, top + h + PAD) — real halo rows serve as padding where
    # they exist, zeros elsewhere
    lo = top - PAD
    hi = top + h + PAD
    pad_top = max(0, -lo)
    pad_bot = max(0, hi - eh)
    pcf = jnp.pad(pcf, ((0, 0), (pad_top, pad_bot), (PAD, 128 - PAD)))
    pcf = pcf[:, lo + pad_top:hi + pad_top]
    grid = (h // BR, w // BC)
    out = pl.pallas_call(
        functools.partial(_kernel, r=r, k_taps=k, c_ch=c),
        interpret=INTERPRET,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, BR, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BR, BC), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k, c, BR, BC), lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, BR + 2 * PAD, BC + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(dy, dx, pcf)
    return jnp.transpose(out, (0, 2, 3, 1))          # (K, H, W, C)


def _scatter_kernel(key_ref, g_hbm, out_ref, gwin, keywin,
                    acc_ref, gsem, osem, *, r, k_taps, c_ch, disk_r2):
    """Transpose of the windowed gather: every destination pixel p sums
    the cotangents of the source pixels q (within the offset window)
    whose tap targeted p: gp[p] = sum_{q,k : q+off_k(q)=p} g[k,q].
    Sequential accumulation — no scatter collisions. Per-tap window DMAs
    are double-buffered; the accumulator lives in VMEM scratch with one
    read-modify-write per (tap, row-offset) to bound register pressure."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    wr = BR + 2 * PAD
    wc = BC + 128

    def gdma(k, slot):
        return pltpu.make_async_copy(
            g_hbm.at[k, :, pl.ds(i * BR, wr), pl.ds(j * BC, wc)],
            gwin.at[slot], gsem.at[slot])

    gdma(0, 0).start()
    # fused offset-key window in padded coordinates (key = (dy+r)*W +
    # (dx+r); pads hold a sentinel that never matches): ONE compare per
    # (sy, sx) combo instead of two, and one window DMA instead of two
    dma_k = pltpu.make_async_copy(
        key_ref.at[:, pl.ds(i * BR, wr), pl.ds(j * BC, wc)], keywin, osem)
    dma_k.start()
    dma_k.wait()

    kw = 2 * r + 1
    acc_ref[:] = jnp.zeros((c_ch, BR, BC), jnp.float32)
    for k in range(k_taps):
        slot = k % 2
        gdma(k, slot).wait()
        if k + 1 < k_taps:
            gdma(k + 1, (k + 1) % 2).start()
        for sy in range(-r, r + 1):
            # source rows q_y = p_y - sy at window offset PAD - sy
            rs = PAD - sy
            keyr = keywin[k, rs:rs + BR, :]
            row = jnp.zeros((c_ch, BR, BC), jnp.float32)
            any_sx = False
            for sx in range(-r, r + 1):
                # offsets are truncations of points in a disk of radius
                # sqrt(disk_r2) (+ screen clamping, which only shrinks
                # them), so square-corner combos can never occur — skip
                # their 32-channel masked adds (24 of 121 at radius 30)
                if sy * sy + sx * sx > disk_r2:
                    continue
                any_sx = True
                cs = PAD - sx
                m = keyr[:, cs:cs + BC] == ((sy + r) * kw + (sx + r))
                sl = gwin[slot, :, rs:rs + BR, cs:cs + BC]
                row = row + jnp.where(m[None], sl, 0.0)
            if any_sx:
                acc_ref[:] = acc_ref[:] + row
    out_ref[:] = acc_ref[:]


def _scatter_local_transpose(g, tys, txs, r, h, w, c,
                             disk_r2=None):
    """g (K, H, W, C) cotangents of gather_local -> payload cotangent
    (H, W, C), as a Pallas windowed sum (XLA's scatter-add moves ~one
    element per cycle and dominated the backward pass)."""
    k = g.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    dy = tys - ys
    dx = txs - xs
    gcf = jnp.transpose(g, (0, 3, 1, 2))             # (K, C, H, W)
    gcf = jnp.pad(gcf, ((0, 0), (0, 0), (PAD, PAD), (PAD, 128 - PAD)))
    kw = 2 * r + 1
    key = (dy + r) * kw + (dx + r)                   # fused offset key
    keyp = jnp.pad(key, ((0, 0), (PAD, PAD), (PAD, 128 - PAD)),
                   constant_values=jnp.int32(-1))    # never matches
    grid = (h // BR, w // BC)
    wr, wc = BR + 2 * PAD, BC + 128
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, r=r, k_taps=k, c_ch=c,
                          disk_r2=2 * r * r if disk_r2 is None
                          else disk_r2),
        interpret=INTERPRET,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, BR, BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, wr, wc), jnp.float32),
            pltpu.VMEM((k, wr, wc), jnp.int32),
            pltpu.VMEM((c, BR, BC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )(keyp, gcf)
    return jnp.transpose(out, (1, 2, 0))


def _gather_local_fwd(payload, tys, txs, r, top, disk_r2=None):
    return gather_local(payload, tys, txs, r, top, disk_r2), (
        tys, txs, payload.shape)


def _gather_local_bwd(r, top, disk_r2, res, g):
    tys, txs, (eh, w, c) = res
    if (SCATTER_KERNEL and top == 0 and eh == tys.shape[1]
            and supports(eh, w, r)):
        gp = _scatter_local_transpose(g, tys, txs, r, eh, w, c, disk_r2)
    else:
        # extended payloads: XLA scatter-add transpose (tys are payload
        # coordinates already)
        idx = (tys * w + txs).reshape(-1)
        gp = jnp.zeros((eh * w, c), g.dtype).at[idx].add(
            g.reshape(-1, c)).reshape(eh, w, c)
    return gp, None, None


gather_local.defvjp(_gather_local_fwd, _gather_local_bwd)


def supports(h: int, w: int, r: int) -> bool:
    """Kernel applicability: TPU backend (the Mosaic kernel does not lower
    on CPU), tile-aligned image, offsets within PAD."""
    return (r <= PAD and h % BR == 0 and w % BC == 0
            and (jax.default_backend() != "cpu" or INTERPRET))
