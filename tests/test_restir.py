"""Integration oracles for the ReSTIR pipeline (SURVEY.md §4):
mean invariance across integrators/reuse schemes on the Cornell box, and
variance reduction from resampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir import rng
from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.nee import render_nee
from tpu_restir.render.integrators.restir.pipeline import (
    render_restir_frames)
from tpu_restir.scene import cornell_box

SIZE = 24
N_FRAMES = 30


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box()
    ccfg = CameraConfig(width=SIZE, height=SIZE, fov_y_deg=45.0,
                        view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0),
                        pixel_sampler="random")
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       integrator="restir")
    cam = cam_mod.make_camera(ccfg)
    return scene, cfg, cam


def _nee_mean(scene, cfg, cam, strategy, frames=N_FRAMES):
    # ReSTIR renders DIRECT illumination only (+ directly-viewed
    # emitters), so the cross-integrator oracle is NEE with GI disabled.
    cfg = cfg.replace(integrator="nee", direct_strategy=strategy,
                      nee_calc_gi=False)
    fn = jax.jit(render_nee, static_argnames=("cfg",))
    acc = jnp.zeros((SIZE, SIZE, 3))
    for f in range(frames):
        img = fn(scene, cam, cfg, rng.frame_key(0, f))
        acc = acc + (img - acc) / (f + 1.0)
    return acc


def _restir_mean(scene, cfg, cam, rp, frames=N_FRAMES, seed=0):
    cfg = cfg.replace(restir=rp)
    return render_restir_frames(scene, cam, cfg, seed, frames)


def test_mean_invariance_ris_vs_mis(setup):
    """First-moment preservation: plain RIS (no reuse) must match the NEE
    MIS ground truth (the reference's unbiasedness methodology,
    BASELINE.md 'unbiasedness anchor')."""
    scene, cfg, cam = setup
    ref = float(jnp.mean(_nee_mean(scene, cfg, cam, "mis")))
    ris = float(jnp.mean(_restir_mean(
        scene, cfg, cam, RestirParams(m_area=4, m_brdf=1))))
    assert np.isclose(ris, ref, rtol=0.06), (ris, ref)


def test_mean_invariance_reuse_schemes(setup):
    """Temporal and unbiased spatial schemes must preserve the mean."""
    scene, cfg, cam = setup
    ref = float(jnp.mean(_restir_mean(
        scene, cfg, cam, RestirParams(m_area=4, m_brdf=1), seed=7)))
    temporal = float(jnp.mean(_restir_mean(
        scene, cfg, cam,
        RestirParams(m_area=4, m_brdf=1, do_temporal_reuse=True), seed=8)))
    pairwise = float(jnp.mean(_restir_mean(
        scene, cfg, cam,
        RestirParams(m_area=4, m_brdf=1, do_spatial_reuse=True,
                     spatial_neighbor_count=3, spatial_mis="pairwise"),
        seed=9)))
    balance = float(jnp.mean(_restir_mean(
        scene, cfg, cam,
        RestirParams(m_area=4, m_brdf=1, do_spatial_reuse=True,
                     spatial_neighbor_count=3, spatial_mis="balance"),
        seed=10)))
    assert np.isclose(temporal, ref, rtol=0.08), (temporal, ref)
    assert np.isclose(pairwise, ref, rtol=0.08), (pairwise, ref)
    assert np.isclose(balance, ref, rtol=0.08), (balance, ref)


def test_visibility_pass_equivalent(setup):
    """With the visibility pass on, initial-candidate p_hat omits V but the
    occluded survivor is zeroed — the mean must be preserved."""
    scene, cfg, cam = setup
    a = float(jnp.mean(_restir_mean(
        scene, cfg, cam, RestirParams(m_area=4, m_brdf=1), seed=3)))
    b = float(jnp.mean(_restir_mean(
        scene, cfg, cam,
        RestirParams(m_area=4, m_brdf=1, do_visibility_pass=True), seed=4)))
    assert np.isclose(a, b, rtol=0.08), (a, b)


def test_spatial_reuse_reduces_noise(setup):
    """Per-frame MSE vs a converged reference must drop with spatial reuse
    at equal candidate counts (the point of ReSTIR)."""
    scene, cfg, cam = setup
    ref = np.asarray(_restir_mean(scene, cfg, cam,
                                  RestirParams(m_area=8, m_brdf=1),
                                  frames=60, seed=11))

    def frame_mse(rp, seed):
        img = np.asarray(_restir_mean(scene, cfg, cam, rp, frames=1,
                                      seed=seed))
        return float(((img - ref) ** 2).mean())

    mse_plain = np.mean([frame_mse(RestirParams(m_area=1, m_brdf=1), s)
                         for s in range(20, 24)])
    mse_spatial = np.mean([frame_mse(
        RestirParams(m_area=1, m_brdf=1, do_spatial_reuse=True,
                     spatial_neighbor_count=5, spatial_mis="pairwise"), s)
        for s in range(20, 24)])
    assert mse_spatial < mse_plain, (mse_spatial, mse_plain)
