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


def _gb_like(albedo, normal, depth):
    """Minimal GBuffer stand-in for svgf_temporal_update (pos derived
    from depth on a flat plane; identity camera looking down -z)."""
    import jax

    from tpu_restir.render.integrators.restir.gbuffer import GBuffer

    h, w = depth.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    focal = jnp.asarray(float(w))
    # invert the reference projection x = (-vx/vz)*f + w/2 with vz=-depth
    vx = (xs - w / 2.0) / focal * depth
    vy = (ys - h / 2.0) / focal * depth
    pos = jnp.stack([vx, -vy, -depth], axis=-1)  # view == world (identity)
    z3 = jnp.zeros((h, w, 3))
    return GBuffer(pos=pos, normal=normal, diffuse=albedo, specular=z3,
                   emission=z3, shininess=jnp.zeros((h, w)), depth=depth,
                   mat_type=jnp.ones((h, w), jnp.int32),
                   inv_i_m=jnp.ones((h, w)),
                   cam_pos=jnp.zeros((3,)),
                   view_mat=jnp.eye(4), focal=focal)


def test_svgf_temporal_accumulation_converges_and_survives_reset():
    """Static camera: N frames of temporal accumulation must reduce MSE
    ~like averaging (variance moments shrink; length grows). The history
    must also reject invalid reprojections (depth change) by resetting
    to the current frame."""
    from tpu_restir.denoise import empty_svgf_history, svgf_temporal_update

    noisy, clean, albedo, normal, depth, var = _synthetic(noise=0.25)
    gb = _gb_like(albedo, normal, depth)
    rng = np.random.default_rng(7)
    h, w = depth.shape
    hist = empty_svgf_history(h, w)
    for i in range(6):
        frame = clean + jnp.asarray(
            rng.normal(0, 0.25, clean.shape).astype(np.float32))
        hist, color, v = svgf_temporal_update(hist, frame, gb)
    mse_one = _mse(frame, clean)
    mse_acc = _mse(color, clean)
    assert mse_acc < mse_one / 3.0, (mse_acc, mse_one)
    assert float(hist.length.min()) >= 5.0
    # temporal variance moments reflect the per-frame noise (0.25^2
    # luminance noise, shrunk by clamping), not ~0
    assert 1e-4 < float(v.mean()) < 0.25, float(v.mean())

    # geometry change (depth doubles): history must be rejected
    gb2 = _gb_like(albedo, normal, depth * 4.0)
    frame2 = clean + 0.5
    hist2, color2, _ = svgf_temporal_update(hist, frame2, gb2)
    np.testing.assert_allclose(np.asarray(color2), np.asarray(frame2),
                               atol=1e-6)
    assert float(hist2.length.max()) == 1.0


def test_svgf_temporal_clamps_stale_fireflies():
    """A firefly in HISTORY must be clamped to the current frame's 3x3
    neighborhood range instead of ghosting on."""
    from tpu_restir.denoise import empty_svgf_history, svgf_temporal_update

    noisy, clean, albedo, normal, depth, var = _synthetic(noise=0.0)
    gb = _gb_like(albedo, normal, depth)
    h, w = depth.shape
    hist = empty_svgf_history(h, w)
    hist, _, _ = svgf_temporal_update(hist, clean, gb)
    # poison one history pixel with a huge value
    hist = hist.replace(color=hist.color.at[20, 20].set(500.0))
    hist, color, _ = svgf_temporal_update(hist, clean, gb)
    assert float(color[20, 20].max()) <= float(clean[20, 20].max()) + 1e-4


def test_svgf_dilation_levels_engage_at_256():
    """At 256^2 all 5 a-trous levels run (cap = log2 rule): the filter's
    effective support must clearly exceed a 1-level filter's on a
    smooth-region noise pattern (Weak #6 r4: no test exercised the
    dilation cap)."""
    rng = np.random.default_rng(2)
    h = w = 256
    clean = jnp.full((h, w, 3), 0.4)
    noisy = clean + jnp.asarray(
        rng.normal(0, 0.3, (h, w, 3)).astype(np.float32))
    albedo = jnp.full((h, w, 3), 0.5)
    normal = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
    depth = jnp.ones((h, w))
    var = jnp.full((h, w), 0.09)
    den5 = svgf_denoise(noisy, albedo, normal, depth, var, iterations=5)
    den1 = svgf_denoise(noisy, albedo, normal, depth, var, iterations=1)
    mse5 = _mse(den5, clean)
    mse1 = _mse(den1, clean)
    # five dilated passes average a far larger footprint
    assert mse5 < mse1 / 4.0, (mse5, mse1)


def test_svgf_exclude_mask_blocks_light_bleed():
    """Emissive (excluded) pixels must neither change nor leak their
    radiance into neighbors (Weak #6 r4: the exclude passthrough was
    untested against bleed)."""
    noisy, clean, albedo, normal, depth, var = _synthetic(noise=0.05)
    h, w = depth.shape
    # a bright emissive patch in the left (dark) region
    patch = np.zeros((h, w), bool)
    patch[40:48, 10:18] = True
    bright = noisy.at[40:48, 10:18].set(50.0)
    den = np.asarray(svgf_denoise(bright, albedo, normal, depth, var,
                                  exclude=jnp.asarray(patch)))
    # excluded pixels pass through untouched
    np.testing.assert_allclose(den[40:48, 10:18],
                               np.asarray(bright)[40:48, 10:18],
                               rtol=1e-5)
    # neighbors just outside the patch stay near the clean value — no
    # 50.0 radiance bleeding out (one tap of 50 would add >> 0.2)
    ring = den[36:52, 6:22].copy()
    ring[4:12, 4:12] = np.asarray(clean)[40:48, 10:18]  # mask patch out
    assert float(np.abs(ring - np.asarray(clean)[36:52, 6:22]).max()) \
        < 0.5, float(np.abs(ring - np.asarray(clean)[36:52, 6:22]).max())


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
