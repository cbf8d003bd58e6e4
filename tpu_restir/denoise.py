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
import numpy as np
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


def _luminance(c):
    return (0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2])


@partial(jax.jit, static_argnames=("iterations",))
def svgf_denoise(color, albedo, normal, depth, variance, exclude=None, *,
                 iterations: int = 5, sigma_l: float = 4.0,
                 sigma_z: float = 1.0, sigma_n: float = 128.0,
                 sigma_a: float = 0.2):
    """SVGF-style edge-avoiding à-trous wavelet filter with variance
    guidance (Schied et al. 2017), the capability-parity replacement for
    OIDN's learned HDR filter (pg/simpleguidx11.cpp:52-75): `iterations`
    passes of a 5x5 B3-spline stencil at dilation 2^i, with per-tap
    weights from depth, normal, albedo, and a LUMINANCE weight scaled by
    the per-pixel noise standard deviation — strong smoothing where the
    estimator is noisy, edge-stopping where it is converged. The variance
    image is filtered alongside the color with squared weights, so later
    iterations see the reduced residual variance.

    color (H,W,3) HDR; albedo/normal (H,W,3); depth (H,W);
    variance (H,W) = luminance variance of the color ESTIMATE (the
    renderer's accumulated second moment / sample count).
    """
    k1 = jnp.asarray([1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16])
    h, w = depth.shape

    def shifted(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    yi = jnp.arange(h)[:, None]
    xi = jnp.arange(w)[None, :]

    def inside(dy, dx):
        # roll wraps; off-image taps must get zero weight
        return ((yi + dy >= 0) & (yi + dy < h)
                & (xi + dx >= 0) & (xi + dx < w)).astype(jnp.float32)

    keepf = (jnp.zeros((h, w)) if exclude is None
             else exclude.astype(jnp.float32))

    # filter in a Reinhard-compressed domain: y = c/(1+L), s = 1/(1+L),
    # output Sum(w y)/Sum(w s) — a luminance-damped weighted mean that
    # bounds how far HDR outliers (fireflies, near-light splash) can
    # bleed; variance is scaled into the same domain
    lum0 = _luminance(color)
    sc = 1.0 / (1.0 + lum0)

    # cap the dilation so the widest stencil still fits the image
    # (5 levels is the 1080p setting; tiny test images use fewer)
    iters = min(iterations,
                max(1, int(np.log2(max(min(h, w) // 10, 2))) + 1))

    c = color * sc[..., None]
    sw = sc
    # Var(sc * L) = sc^2 Var(L): luminance variance transforms with the
    # square of the compression scale (an extra sc^2 over-shrank sigma_l
    # at bright pixels — exactly where fireflies need smoothing)
    var = jnp.maximum(variance, 0.0) * sc ** 2
    for it in range(iters):
        s = 1 << it
        # 3x3 prefilter of the variance -> stable sigma for w_l
        vg = jnp.zeros_like(var)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                vg = vg + shifted(var, dy, dx)
        sig_l = sigma_l * jnp.sqrt(vg / 9.0) + 1e-6
        lum = _luminance(c)
        acc = jnp.zeros_like(c)
        sacc = jnp.zeros_like(sw)
        vacc = jnp.zeros_like(var)
        wacc = jnp.zeros_like(var)
        for ty in range(-2, 3):
            for tx in range(-2, 3):
                dy, dx = ty * s, tx * s
                hk = k1[ty + 2] * k1[tx + 2]
                cq = shifted(c, dy, dx)
                vq = shifted(var, dy, dx)
                w_z = jnp.exp(-jnp.abs(shifted(depth, dy, dx) - depth)
                              / (sigma_z * s + 1e-6))
                w_n = jnp.maximum(
                    jnp.sum(shifted(normal, dy, dx) * normal, -1),
                    0.0) ** sigma_n
                w_a = jnp.exp(-jnp.sum(
                    (shifted(albedo, dy, dx) - albedo) ** 2, -1)
                    / (2 * sigma_a ** 2))
                w_l = jnp.exp(-jnp.abs(_luminance(cq) - lum) / sig_l)
                wt = hk * w_z * w_n * w_a * w_l * inside(dy, dx) \
                    * (1.0 - shifted(keepf, dy, dx))
                acc = acc + cq * wt[..., None]
                sacc = sacc + shifted(sw, dy, dx) * wt
                vacc = vacc + vq * wt * wt
                wacc = wacc + wt
        cf = acc / jnp.maximum(wacc, 1e-8)[..., None]
        sf = sacc / jnp.maximum(wacc, 1e-8)
        # excluded pixels (and pixels whose whole stencil is excluded)
        # pass through untouched
        keep = (keepf > 0.5) | (wacc <= 1e-8)
        c = jnp.where(keep[..., None], c, cf)
        sw = jnp.where(keep, sw, sf)
        var = jnp.where(keep, var, vacc / jnp.maximum(wacc, 1e-8) ** 2)
    return c / jnp.maximum(sw, 1e-6)[..., None]


def spatial_variance(color):
    """3x3 local luminance variance — the SVGF first-frames fallback
    when too few accumulated samples exist for a temporal moment
    estimate."""
    lum = _luminance(color)

    def blur(x):
        acc = jnp.zeros_like(x)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = acc + jnp.roll(x, (-dy, -dx), axis=(0, 1))
        return acc / 9.0

    return jnp.maximum(blur(lum * lum) - blur(lum) ** 2, 0.0)


def denoise_accumulator(accumulator, gbuffer, radius: int = 3,
                        variance=None, method: str = "svgf"):
    """OIDN-style call: color=accumulator, albedo=gBuffer.diffuse,
    normal=gBuffer.worldNormal (pg/simpleguidx11.cpp:55-66).

    method='svgf' (default) runs the variance-guided à-trous filter;
    'bilateral' keeps the round-1 joint-bilateral. Without a variance
    image (naive callers), svgf assumes a uniform moderate noise level.
    """
    if method == "bilateral":
        return joint_bilateral(accumulator, gbuffer.diffuse, gbuffer.normal,
                               gbuffer.depth, radius=radius)
    if variance is None:
        variance = spatial_variance(accumulator)
    return svgf_denoise(accumulator, gbuffer.diffuse, gbuffer.normal,
                        gbuffer.depth, variance,
                        exclude=gbuffer.is_emissive())
