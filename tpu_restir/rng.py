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
PASS_GBUFFER = 1
PASS_INITIAL_AREA = 2
PASS_INITIAL_BRDF = 3
PASS_INITIAL_WRS = 4
PASS_TEMPORAL = 5
PASS_SPATIAL = 6       # + pass index is folded in separately
PASS_NAIVE = 7
PASS_NEE_DIRECT = 8
PASS_NEE_GI = 9
PASS_RIS = 10
PASS_APERTURE = 11


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


def device_key(key: jax.Array, axis_name: str) -> jax.Array:
    """Inside shard_map: decorrelate streams across mesh devices."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
