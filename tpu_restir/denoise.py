"""Denoiser: edge-preserving joint-bilateral filter on G-buffer features.

Replacement for the reference's OIDN integration
(pg/simpleguidx11.cpp:52-75, 255-260), which feeds color + albedo +
normal into a learned filter. Here the same feature buffers (the ReSTIR
G-buffer's diffuse and worldNormal, plus depth) guide a vectorized
cross-bilateral kernel — pure stencil math that XLA fuses into a single
dense op, no host roundtrip. Applied to the HDR accumulator before
tonemapping, exactly where OIDN sits in the display pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius",))
def joint_bilateral(color, albedo, normal, depth, *, radius: int = 3,
                    sigma_space: float = 2.0, sigma_albedo: float = 0.15,
                    sigma_normal: float = 0.25, sigma_depth: float = 0.5):
    """color (H,W,3) guided by albedo (H,W,3), normal (H,W,3), depth (H,W)."""
    h, w = depth.shape
    acc = jnp.zeros_like(color)
    wacc = jnp.zeros(depth.shape)

    def shifted(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w_s = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma_space ** 2))
            a = shifted(albedo, dy, dx)
            n = shifted(normal, dy, dx)
            z = shifted(depth, dy, dx)
            c = shifted(color, dy, dx)
            w_a = jnp.exp(-jnp.sum((a - albedo) ** 2, -1)
                          / (2 * sigma_albedo ** 2))
            w_n = jnp.exp(-jnp.sum((n - normal) ** 2, -1)
                          / (2 * sigma_normal ** 2))
            w_z = jnp.exp(-(z - depth) ** 2 / (2 * sigma_depth ** 2))
            wgt = w_s * w_a * w_n * w_z
            acc += c * wgt[..., None]
            wacc += wgt
    return acc / jnp.maximum(wacc, 1e-8)[..., None]


def denoise_accumulator(accumulator, gbuffer, radius: int = 3):
    """OIDN-style call: color=accumulator, albedo=gBuffer.diffuse,
    normal=gBuffer.worldNormal (pg/simpleguidx11.cpp:55-66)."""
    return joint_bilateral(accumulator, gbuffer.diffuse, gbuffer.normal,
                           gbuffer.depth, radius=radius)
