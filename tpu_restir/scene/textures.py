"""Texture sampling over a fixed-size device texture stack.

The reference decodes textures with FreeImage and samples them per-pixel
with nearest/bilinear filtering and CLAMP/REPEAT addressing
(pg/Texture.cpp:9-194). Here all textures are resampled at load time into
one (T, S, S, 3) float32 stack so a whole image of lookups is a single
gather, and filtering is vectorized bilinear.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

CLAMP = "clamp"
REPEAT = "repeat"


def build_texture_stack(images: List[np.ndarray], size: int = 256) -> np.ndarray:
    """Resize (nearest) a list of HxWx3 float images to one (T,S,S,3) stack."""
    out = np.zeros((len(images), size, size, 3), np.float32)
    for i, img in enumerate(images):
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        h, w = img.shape[:2]
        ys = (np.arange(size) * h / size).astype(np.int32)
        xs = (np.arange(size) * w / size).astype(np.int32)
        out[i] = img[ys[:, None], xs[None, :], :3]
    return out


def sample_bilinear(image: jnp.ndarray, uv: jnp.ndarray,
                    address: str = CLAMP) -> jnp.ndarray:
    """Bilinear lookup into one (H, W, 3) image at uv in [0,1]^2; uv.y=0 is
    the bottom row (the reference flips y in get_texel, pg/Texture.cpp)."""
    h, w = image.shape[0], image.shape[1]
    x = uv[..., 0] * (w - 1)
    y = (1.0 - uv[..., 1]) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def addr(i, n):
        if address == REPEAT:
            return jnp.mod(i.astype(jnp.int32), n)
        return jnp.clip(i.astype(jnp.int32), 0, n - 1)

    x0i, x1i = addr(x0, w), addr(x0 + 1, w)
    y0i, y1i = addr(y0, h), addr(y0 + 1, h)
    c00 = image[y0i, x0i]
    c01 = image[y0i, x1i]
    c10 = image[y1i, x0i]
    c11 = image[y1i, x1i]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_stack(stack: jnp.ndarray, tex_id: jnp.ndarray, uv: jnp.ndarray,
                 fallback: jnp.ndarray) -> jnp.ndarray:
    """Lookup texel for each element; tex_id < 0 -> fallback color."""
    t = jnp.clip(tex_id, 0, stack.shape[0] - 1)
    s = stack.shape[1]
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (s - 1)
    y = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (s - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, s - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00 = stack[t, y0, x0]
    c01 = stack[t, y0, x0 + 1]
    c10 = stack[t, y0 + 1, x0]
    c11 = stack[t, y0 + 1, x0 + 1]
    texel = (c00 * (1 - fx) + c01 * fx) * (1 - fy) \
        + (c10 * (1 - fx) + c11 * fx) * fy
    return jnp.where((tex_id >= 0)[..., None], texel, fallback)
