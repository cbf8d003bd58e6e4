"""Shaped Monte-Carlo samplers.

Counterpart of the reference's Sampling/Distribution/PixelSampler layers
(pg/Sampling.cpp, pg/Distribution.h, pg/PixelSampler.h), reformulated as
whole-image shaped draws from counter-based keys: one call produces the
sample for every pixel/ray at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir import mathx
from tpu_restir.config import PixelSamplerKind

_TWO_PI = 2.0 * jnp.pi


# ---------------------------------------------------------------------------
# pixel (anti-aliasing) samplers — reference pg/PixelSampler.h:6-67
# ---------------------------------------------------------------------------

def pixel_offsets_u(u4, kind: str, grid=(5, 5)):
    """Sub-pixel offsets in [0,1)^2 from (..., 4) uniforms."""
    shape = u4.shape[:-1]
    if kind == PixelSamplerKind.CENTER:
        return jnp.zeros(shape + (2,), jnp.float32)
    if kind == PixelSamplerKind.RANDOM:
        return u4[..., :2]
    if kind == PixelSamplerKind.STRATIFIED:
        gx, gy = grid
        block = jnp.array([1.0 / gx, 1.0 / gy], jnp.float32)
        jitter = u4[..., :2] * block
        cell = jnp.floor(u4[..., 2:4] * jnp.array([gx, gy], jnp.float32)) \
            * block
        return cell + jitter
    raise ValueError(f"unknown pixel sampler {kind!r}")


def pixel_offsets(key: jax.Array, shape, kind: str, grid=(5, 5)):
    """Key-based wrapper: sub-pixel offsets in [0,1)^2, returns (..., 2)."""
    return pixel_offsets_u(jax.random.uniform(key, shape + (4,)), kind, grid)


# ---------------------------------------------------------------------------
# geometric samplers — reference pg/Sampling.cpp
# ---------------------------------------------------------------------------

def disk_from_uniforms(u, radius: float):
    """Disk offsets per the reference's formula r = sqrt(U(0, R))
    (pg/Sampling.cpp:78-87). NOTE the quirk (SURVEY.md §2.5): the radius
    argument bounds r^2, so the effective pixel radius is sqrt(R). The
    formula is replicated, not the intent. u: (..., 2) uniforms.
    """
    theta = u[..., 0] * 2.0 * jnp.pi
    r = jnp.sqrt(u[..., 1] * radius)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_disk_uniform(key: jax.Array, radius: float, shape):
    return disk_from_uniforms(jax.random.uniform(key, shape + (2,)), radius)


@functools.lru_cache(maxsize=None)
def disk_int_offset_table(radius: float, n: int = 4096):
    """Static (n, 2) int table distributed as
    trunc(disk_from_uniforms(U, radius)) — the reference's integer
    spatial-neighbor offset (pg/ReSTIRIntegrator.cpp:334-341, glm
    ivec2 truncation, including the double-width 0 row/column quirk).

    Why a table: the float path's cos/sin (and any fused float chain)
    may round differently between compilations (e.g. sharded vs
    unsharded programs), flipping trunc() at cell boundaries — the one
    source of sharded/unsharded divergence (round-4 Weak #2). Indexing
    a constant table with the top bits of the uniform is integer-exact
    in every compilation. r^2 ~ U(0,R) makes the float pick UNIFORM
    over the disk of radius sqrt(R), so each integer cell's probability
    is its area overlap with that disk — integrated here on a fine
    host-side float64 subgrid and quantized to n slots by largest
    remainder (cell-probability error <= 1/n)."""
    rad = float(np.sqrt(max(radius, 0.0)))
    m = 2048
    xs = (np.arange(m, dtype=np.float64) + 0.5) / m * 2 * rad - rad
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    inside = gx * gx + gy * gy <= rad * rad
    ix = np.trunc(gx[inside]).astype(np.int64)
    iy = np.trunc(gy[inside]).astype(np.int64)
    k = int(np.ceil(rad)) + 1
    w = 2 * k + 1
    hist = np.bincount((ix + k) * w + (iy + k), minlength=w * w)
    probs = hist / hist.sum()
    counts = np.floor(probs * n).astype(np.int64)
    rem = probs * n - counts
    short = n - counts.sum()
    counts[np.argsort(-rem)[:short]] += 1
    # occupied cells in packed order with cumulative slot starts: slot
    # index s in [0, n) maps to the last cell whose start <= s, so
    # cell(s) = sum_j [s >= start_j] * delta_j with delta the cell-value
    # differences — consumed by the compare-sum in disk_int_from_uniform
    # (no gather).
    occ = np.nonzero(counts)[0]
    starts = np.concatenate([[0], np.cumsum(counts[occ])[:-1]])
    cells = np.stack([occ // w - k, occ % w - k], axis=1)
    deltas = np.diff(cells, axis=0, prepend=np.zeros((1, 2), np.int64))
    return (starts.astype(np.float32), deltas.astype(np.float32), int(n))


def disk_int_from_uniform(u, radius: float):
    """Integer disk offsets (dx, dy) from ONE uniform draw — bitwise
    identical across compilations: the float u -> slot step is one
    exact power-of-two scale + floor, and the slot -> cell map is a
    dense compare-sum over the ~100 occupied cells (a small matmul —
    every operand and partial sum is a small integer, exact in any
    precision, so no compilation can round it differently; a 2M-row
    table GATHER here measured ~5 ms/draw and cost Cornell fwd 13%)."""
    starts, deltas, n = disk_int_offset_table(float(radius))
    idx = jnp.clip(jnp.floor(u * n), 0, n - 1)
    ge = (idx[..., None] >= jnp.asarray(starts)).astype(jnp.float32)
    off = ge @ jnp.asarray(deltas)                 # (..., 2)
    return off.astype(jnp.int32)


def triangle_barycentrics_from_uniforms(u):
    """Uniform barycentric weights (x, y, z) per pg/Sampling.cpp:63-76.
    u: (..., 2) uniforms."""
    r1, r2 = u[..., 0], u[..., 1]
    s = jnp.sqrt(r1)
    return jnp.stack([1.0 - s, s * (1.0 - r2), s * r2], axis=-1)


def sample_triangle_barycentrics(key: jax.Array, shape):
    return triangle_barycentrics_from_uniforms(
        jax.random.uniform(key, shape + (2,)))


def ggx_vndf_from_uniforms(u2, ve, alpha, g1, d_ggx):
    """Heitz 2018 GGX visible-normal sampling in tangent space
    (reference Sampling::sampleGGXVNDF, pg/Sampling.cpp:105-134 —
    implemented there but unused by the live path; kept for parity).

    ve: (..., 3) view dir in tangent space (+z up); alpha: GGX alpha.
    Returns (ne, pdf) with pdf = G1(ve) * max(0, ve.ne) * D / ve_z.
    """
    u1, u2_ = u2[..., 0], u2[..., 1]
    vh = ve * jnp.stack([jnp.broadcast_to(alpha, ve[..., 0].shape),
                         jnp.broadcast_to(alpha, ve[..., 0].shape),
                         jnp.ones_like(ve[..., 0])], axis=-1)
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True),
                          1e-20)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv,
                   jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = _TWO_PI * u2_
    c1 = r * jnp.cos(phi)
    c2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    c2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0)) + s * c2
    nh = (c1[..., None] * t1 + c2[..., None] * t2
          + jnp.sqrt(jnp.maximum(1.0 - c1 * c1 - c2 * c2,
                                 0.0))[..., None] * vh)
    ne = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                    jnp.maximum(nh[..., 2], 0.0)], axis=-1)
    ne = ne / jnp.maximum(jnp.linalg.norm(ne, axis=-1, keepdims=True),
                          1e-20)
    pdf = g1 * jnp.maximum(jnp.sum(ve * ne, axis=-1), 0.0) * d_ggx \
        / jnp.maximum(ve[..., 2], 1e-20)
    return ne, pdf


# ---------------------------------------------------------------------------
# directional distributions — reference pg/Distribution.h
# ---------------------------------------------------------------------------

def cosine_hemisphere_from_uniforms(u, normal):
    """Cosine-weighted hemisphere direction around `normal`
    (CosineWeightedDistribution::sample, pg/Distribution.h:9-31).
    u: (..., 2) uniforms."""
    r1, r2 = u[..., 0], u[..., 1]
    sq = mathx.safe_sqrt(1.0 - r2)
    local = jnp.stack([jnp.cos(_TWO_PI * r1) * sq,
                       jnp.sin(_TWO_PI * r1) * sq,
                       mathx.safe_sqrt(r2)], axis=-1)
    local = mathx.normalize(local)
    o1, o2 = mathx.onb(normal)
    return mathx.to_world(o1, o2, normal, local)


def sample_cosine_hemisphere(key: jax.Array, normal):
    shape = normal.shape[:-1]
    return cosine_hemisphere_from_uniforms(
        jax.random.uniform(key, shape + (2,)), normal)


def pdf_cosine_hemisphere(normal, omega_i):
    """max(n.wi, 0)/pi (CosineWeightedDistribution::getPdf)."""
    return jnp.maximum(mathx.dot(normal, omega_i), 0.0) / jnp.pi


def cosine_lobe_from_uniforms(u, omega_r, gamma):
    """Cosine-lobe (Phong exponent gamma) direction around omega_r
    (CosineLobeDistribution::sample, pg/Distribution.h:41-63).
    u: (..., 2) uniforms."""
    shape = omega_r.shape[:-1]
    r1, r2 = u[..., 0], u[..., 1]
    gamma = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), shape)
    z = jnp.power(jnp.maximum(r2, 1e-30), 1.0 / (gamma + 1.0))
    sq = mathx.safe_sqrt(1.0 - z * z)
    local = jnp.stack([jnp.cos(_TWO_PI * r1) * sq,
                       jnp.sin(_TWO_PI * r1) * sq,
                       z], axis=-1)
    local = mathx.normalize(local)
    o1, o2 = mathx.onb(omega_r)
    return mathx.to_world(o1, o2, omega_r, local)


def sample_cosine_lobe(key: jax.Array, omega_r, gamma):
    shape = omega_r.shape[:-1]
    return cosine_lobe_from_uniforms(
        jax.random.uniform(key, shape + (2,)), omega_r, gamma)


def pdf_cosine_lobe(omega_i, omega_r, gamma):
    """(gamma+1)/(2 pi) * max(0, wi.wr)^gamma (CosineLobeDistribution::getPdf)."""
    c = jnp.maximum(mathx.dot(omega_i, omega_r), 0.0)
    return (gamma + 1.0) / _TWO_PI * mathx.safe_pow(c, gamma)
