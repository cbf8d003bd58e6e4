"""Denoiser oracles (SURVEY.md §5.9; reference OIDN integration,
pg/simpleguidx11.cpp:52-75).

The SVGF-style à-trous filter must (a) reduce noise far more than it
distorts signal on a piecewise-constant scene with known noise, (b) beat
the round-1 joint-bilateral clearly at equal inputs, (c) preserve
G-buffer edges, and (d) reduce image error on a real noisy Cornell
render vs a converged reference.
"""

import jax.numpy as jnp
import numpy as np

from tpu_restir.denoise import joint_bilateral, svgf_denoise


def _synthetic(h=96, w=96, noise=0.25, seed=0):
    """Two-region scene: left dark, right bright, distinct G-buffers."""
    rng = np.random.default_rng(seed)
    region = (np.arange(w)[None, :] >= w // 2).astype(np.float32)
    region = np.broadcast_to(region, (h, w))
    clean = np.stack([0.2 + 0.6 * region] * 3, -1).astype(np.float32)
    albedo = np.stack([0.3 + 0.5 * region, 0.4 * np.ones((h, w)),
                       0.8 - 0.5 * region], -1).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    normal[region > 0.5] = (0.0, 1.0, 0.0)
    depth = (1.0 + region).astype(np.float32)
    noisy = clean + rng.normal(0, noise, clean.shape).astype(np.float32)
    var = np.full((h, w), noise * noise, np.float32)
    return (jnp.asarray(noisy), jnp.asarray(clean), jnp.asarray(albedo),
            jnp.asarray(normal), jnp.asarray(depth), jnp.asarray(var))


def _mse(a, b):
    return float(jnp.mean((a - b) ** 2))


def test_svgf_reduces_noise_and_beats_bilateral():
    noisy, clean, albedo, normal, depth, var = _synthetic()
    den = svgf_denoise(noisy, albedo, normal, depth, var)
    bil = joint_bilateral(noisy, albedo, normal, depth)
    mse_noisy = _mse(noisy, clean)
    mse_svgf = _mse(den, clean)
    mse_bil = _mse(bil, clean)
    assert mse_svgf < mse_noisy / 10.0, (mse_svgf, mse_noisy)
    assert mse_svgf < mse_bil / 2.0, (mse_svgf, mse_bil)


def test_svgf_preserves_gbuffer_edges():
    noisy, clean, albedo, normal, depth, var = _synthetic(noise=0.1)
    den = np.asarray(svgf_denoise(noisy, albedo, normal, depth, var))
    h, w = depth.shape
    left = den[:, : w // 2 - 4].mean()
    right = den[:, w // 2 + 4:].mean()
    # the 0.6 step across the G-buffer edge must survive filtering
    assert right - left > 0.5, (left, right)


def test_svgf_variance_guidance_adapts():
    """Pixels flagged as converged (zero variance) must stay close to
    their input; noisy-flagged pixels get smoothed."""
    noisy, clean, albedo, normal, depth, _ = _synthetic(noise=0.2, seed=3)
    var_zero = jnp.zeros(depth.shape)
    den_conv = np.asarray(svgf_denoise(noisy, albedo, normal, depth,
                                       var_zero))
    den_noisy = np.asarray(svgf_denoise(
        noisy, albedo, normal, depth, jnp.full(depth.shape, 0.04)))
    d_conv = np.abs(den_conv - np.asarray(noisy)).mean()
    d_noisy = np.abs(den_noisy - np.asarray(noisy)).mean()
    assert d_conv < d_noisy / 3.0, (d_conv, d_noisy)


def test_svgf_on_real_render_beats_noisy_and_bilateral():
    """End-to-end: a 1-frame noisy Cornell RIS render denoised vs a
    96-frame converged reference, scored in DISPLAY space on the
    non-emissive pixels — the reference's own comparison methodology is
    exported tonemapped PNGs (SURVEY.md §4)."""
    from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                                   RestirParams)
    from tpu_restir.denoise import spatial_variance
    from tpu_restir.renderer import Renderer, display_image
    from tpu_restir.scene import cornell_box

    def make(n, seed):
        cfg = RenderConfig(
            camera=CameraConfig(width=48, height=48, fov_y_deg=45.0,
                                view_from=(0, -3.9, 1.0),
                                view_at=(0, 0, 1.0),
                                pixel_sampler="random"),
            params=RenderParams(use_skybox=False, denoise=False,
                                tonemap=False, gamma_correct=False),
            restir=RestirParams(m_area=1, m_brdf=0),
            integrator="restir", seed=seed)
        r = Renderer(cornell_box(), cfg)
        r.run(n)
        return r

    from tpu_restir.config import RenderParams as _RP
    disp = _RP()
    ref = np.asarray(display_image(make(96, 11).accumulator, disp))
    r1 = make(1, 5)
    noisy = r1.accumulator
    gb = r1._restir_state.gb_prev
    var = spatial_variance(noisy)  # acc_ctr < 2: first-frame fallback
    emis = gb.is_emissive()
    den = svgf_denoise(noisy, gb.diffuse, gb.normal, gb.depth, var,
                       exclude=emis)
    bil = joint_bilateral(noisy, gb.diffuse, gb.normal, gb.depth)
    m = ~np.asarray(emis)[..., None]

    def mse_m(x):
        dx = np.asarray(display_image(x, disp))
        return float(np.mean((dx - ref)[
            np.broadcast_to(m, dx.shape)] ** 2))

    mse_noisy = mse_m(noisy)
    mse_svgf = mse_m(den)
    mse_bil = mse_m(bil)
    assert mse_svgf < 0.85 * mse_noisy, (mse_svgf, mse_noisy)
    assert mse_svgf < 0.5 * mse_bil, (mse_svgf, mse_bil)
