"""Tonemapping and transfer functions (reference pg/utils.cpp:178-230)."""

from __future__ import annotations

import jax.numpy as jnp


def aces(x):
    """ACES filmic tonemap, clamped to [0,1] (reference Utils::aces)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def srgb_compress(u):
    """Linear -> sRGB (reference Utils::compress, pg/utils.cpp:220-230)."""
    u = jnp.clip(u, 0.0, 1.0)
    return jnp.where(u <= 0.0031308, u * 12.92,
                     1.055 * jnp.power(jnp.maximum(u, 1e-12), 1.0 / 2.4) - 0.055)


def srgb_expand(u):
    """sRGB -> linear (reference Utils::expand, pg/utils.cpp:209-218)."""
    u = jnp.clip(u, 0.0, 1.0)
    return jnp.where(u <= 0.04045, u / 12.92,
                     jnp.power((u + 0.055) / 1.055, 2.4))


def mean_luma(img):
    """Per-pixel channel mean, as used for image statistics
    (reference pg/simpleguidx11.cpp:308-329)."""
    return jnp.mean(img, axis=-1)
