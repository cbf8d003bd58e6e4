"""Halo exchange for row-sharded screen buffers.

Spatial reuse reads neighbors within a bounded pixel radius and temporal
reuse reads reprojected pixels; with rows sharded over devices these taps
cross shard borders. The fix is the renderer's analog of context-parallel
neighbor exchange (SURVEY.md §5.7): ppermute border strips of the
reservoir + G-buffer to both row-neighbors, then gather locally from the
halo-extended buffer. Reprojection is clamped to shard+halo (the
motion-bounded honest default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_width(spatial_radius: float) -> int:
    """Rows of halo needed for spatial reuse: disk offsets are bounded by
    sqrt(radius) (the reference's r = sqrt(U(0,R)) quirk, SURVEY.md §2.5)."""
    import math

    return int(math.ceil(math.sqrt(max(spatial_radius, 0.0)))) + 1


def extend_rows(tree, halo: int, axis_name: str, n_devices: int):
    """Extend each (rows, W, ...) leaf with `halo` rows from both row-mesh
    neighbors via two ppermutes. Missing neighbors (global edges) yield
    zero rows — never addressed, because global coords are clamped to the
    screen before being mapped into the extended buffer."""
    if halo == 0 or n_devices == 1:
        return tree
    up_perm = [(i, i - 1) for i in range(1, n_devices)]     # recv from i+1
    down_perm = [(i, i + 1) for i in range(n_devices - 1)]  # recv from i-1

    def ext(a):
        top = jax.lax.ppermute(a[-halo:], axis_name, down_perm)
        bot = jax.lax.ppermute(a[:halo], axis_name, up_perm)
        return jnp.concatenate([top, a, bot], axis=0)

    return jax.tree.map(ext, tree)


def gather_rows(tree, axis_name: str):
    """Fallback when the reuse halo exceeds the shard height: all-gather
    the row axis (tiled) so taps can reach anywhere. More ICI traffic but
    exact; used automatically by the pipeline for tiny shards."""
    return jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=0, tiled=True), tree)


def local_row(gy, ext_row0, ext_h: int):
    """Map clamped GLOBAL row coords into an extended buffer that starts at
    global row `ext_row0` (0 for unsharded/all-gathered buffers,
    row0 - halo for halo-extended shards)."""
    return jnp.clip(gy - ext_row0, 0, ext_h - 1)
