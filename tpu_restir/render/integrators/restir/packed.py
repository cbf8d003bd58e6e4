"""Packed reuse payload: one flat row-gather for neighbor/reprojection taps.

The reference reads neighbor G-buffer elements and reservoirs through
per-field random access (GBuffer::getAt, pg/GBufferElement.h:44-57;
reservoir indexing in spatialReusePass, pg/ReSTIRIntegrator.cpp:334-478).
A literal translation issues one XLA gather per field per tap; on TPU
those gathers dominate the whole frame (measured: ~90% of spatial-pass
device time at 1080p). TPU-native answer: concatenate every per-pixel
reuse field into a single channel-packed f32 image once per pass, then
serve ALL taps with one flat row gather — rows of 16/32 f32 are a fast,
DMA-friendly gather shape.

Channel layout (32 = GB_CH + RES_CH):
  G-buffer (19): pos 0:3, normal 3:6, diffuse 6:9, specular 9:12,
                 emission 12:15, shininess 15, depth 16, inv_i_m 17,
                 mat_type (bitcast f32) 18
  Reservoir (13): sample.point 19:22, sample.normal 22:25,
                  sample.l_i 25:28, sample.valid 28, w_sum 29, w 30,
                  confidence 31
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_restir.render.integrators.restir.gbuffer import GBuffer
from tpu_restir.render.integrators.restir.reservoir import (LightSample,
                                                            Reservoir)

GB_CH = 19
RES_CH = 13


def pack_gb(gb: GBuffer) -> jnp.ndarray:
    """(h, w) GBuffer -> (h, w, 19) f32 payload."""
    mt = jax.lax.bitcast_convert_type(gb.mat_type, jnp.float32)
    return jnp.concatenate([
        gb.pos, gb.normal, gb.diffuse, gb.specular, gb.emission,
        gb.shininess[..., None], gb.depth[..., None],
        gb.inv_i_m[..., None], mt[..., None]], axis=-1)


def unpack_gb(a: jnp.ndarray, cam_of: GBuffer) -> GBuffer:
    """(..., 19) payload -> GBuffer view (camera snapshot from cam_of)."""
    return GBuffer(
        pos=a[..., 0:3], normal=a[..., 3:6], diffuse=a[..., 6:9],
        specular=a[..., 9:12], emission=a[..., 12:15],
        shininess=a[..., 15], depth=a[..., 16], inv_i_m=a[..., 17],
        mat_type=jax.lax.bitcast_convert_type(a[..., 18], jnp.int32),
        cam_pos=cam_of.cam_pos, view_mat=cam_of.view_mat,
        focal=cam_of.focal)


def pack_res(res: Reservoir) -> jnp.ndarray:
    """(h, w) Reservoir -> (h, w, 13) f32 payload."""
    s = res.sample
    return jnp.concatenate([
        s.point, s.normal, s.l_i,
        s.valid.astype(jnp.float32)[..., None],
        res.w_sum[..., None], res.w[..., None],
        res.confidence[..., None]], axis=-1)


def unpack_res(a: jnp.ndarray) -> Reservoir:
    """(..., 13) payload -> Reservoir view."""
    return Reservoir(
        sample=LightSample(point=a[..., 0:3], normal=a[..., 3:6],
                           l_i=a[..., 6:9], valid=a[..., 9] > 0.5),
        w_sum=a[..., 10], w=a[..., 11], confidence=a[..., 12])


def pack_reuse(gb: GBuffer, res: Reservoir) -> jnp.ndarray:
    """Combined (h, w, 32) payload for spatial-reuse taps."""
    return jnp.concatenate([pack_gb(gb), pack_res(res)], axis=-1)


def gather_packed(packed: jnp.ndarray, ys: jnp.ndarray,
                  xs: jnp.ndarray) -> jnp.ndarray:
    """Tap packed (h, w, C) at integer coords of any shape -> shape + (C,).

    Lowered as a single flat row gather (fast path) instead of a 2-D
    coordinate gather per field (slow path)."""
    h, w, c = packed.shape
    flat = packed.reshape(h * w, c)
    idx = (ys * w + xs).reshape(-1)
    return flat[idx].reshape(ys.shape + (c,))
