"""Counter-based RNG key derivation.

The reference uses one shared std::mt19937{123} from all OpenMP threads
without synchronization — a data race that makes runs non-reproducible
(reference pg/utils.cpp:175-202; SURVEY.md §2.2 P7). Here randomness is
threefry counter-based: a key is derived per (seed, frame, pass, draw) and
per-pixel independence comes from the sample *shape*, which is both
race-free and bit-reproducible across shardings.
"""

from __future__ import annotations

import jax

# Pass ids: stable fold_in constants so every pipeline pass draws from an
# independent stream. (Analog of the reference's pass schedule,
# pg/simpleguidx11.cpp:359-487.)
PASS_PIXEL_JITTER = 0
PASS_INITIAL_AREA = 2
PASS_INITIAL_BRDF = 3
PASS_INITIAL_WRS = 4
PASS_TEMPORAL = 5
PASS_SPATIAL = 6       # + pass index is folded in separately
PASS_NAIVE = 7
PASS_NEE_DIRECT = 8
PASS_NEE_GI = 9


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def frame_key(seed: int, frame) -> jax.Array:
    """Key for one rendered frame: fold the frame counter into the seed key."""
    return jax.random.fold_in(base_key(seed), frame)


def pass_key(fkey: jax.Array, pass_id: int) -> jax.Array:
    return jax.random.fold_in(fkey, pass_id)


def draw_key(pkey: jax.Array, draw: int) -> jax.Array:
    """Key for the i-th candidate/draw inside a pass."""
    return jax.random.fold_in(pkey, draw)


# ---------------------------------------------------------------------------
# Per-pixel counter-based RNG (PCG4D).
#
# The render pipeline draws every random number as a pure function of
# (frame seed, stream id, global pixel coords) via the PCG4D hash
# (Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT 2020).
# Because a draw depends only on *global* coordinates, a row-sharded
# multi-chip render produces bit-identical numbers to the single-chip
# render — the property the halo-exchange parity tests rely on
# (SURVEY.md §4 item 4). jax.random (threefry) remains for host-side and
# test use.
# ---------------------------------------------------------------------------

import jax.numpy as jnp  # noqa: E402


def make_frame_seed(seed: int, frame) -> jax.Array:
    """Mix the config seed and frame counter into one uint32."""
    s = jnp.uint32(seed)
    f = jnp.asarray(frame).astype(jnp.uint32)
    return s * jnp.uint32(0x9E3779B9) + f * jnp.uint32(0x85EBCA6B) \
        + jnp.uint32(1)


def stream_id(pass_id: int, draw: int = 0, slot: int = 0) -> int:
    """Stable stream encoding: one stream per (pass, draw, slot)."""
    return (pass_id << 16) | (draw << 4) | slot


def pcg4d(a, b, c, d):
    """PCG4D hash: four uint32 arrays in, four decorrelated uint32 out."""
    x = a.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = b.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    z = c.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    w = d.astype(jnp.uint32) * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    w ^= w >> 16
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    return x, y, z, w


def _to_unit(u):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (u >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def pixel_uniforms(frame_seed, stream: int, ys, xs, n: int = 1):
    """n<=4 independent U[0,1) draws per pixel, shaped like ys/xs + (n,).

    ys/xs are GLOBAL integer pixel coordinates (broadcastable int arrays).
    """
    assert 1 <= n <= 4
    fs = jnp.broadcast_to(jnp.asarray(frame_seed, jnp.uint32), jnp.shape(ys))
    st = jnp.full(jnp.shape(ys), jnp.uint32(stream))
    outs = pcg4d(jnp.asarray(xs), jnp.asarray(ys), fs, st)
    return jnp.stack([_to_unit(outs[i]) for i in range(n)], axis=-1)


def pixel_uniform(frame_seed, stream: int, ys, xs):
    """Single U[0,1) draw per pixel, shaped like ys/xs."""
    return pixel_uniforms(frame_seed, stream, ys, xs, 1)[..., 0]
