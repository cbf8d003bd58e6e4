"""FD gradient validation in the glossy/textured regime (BASELINE.json
config 4: textured glossy scene, optimize albedo/roughness/emission,
autodiff vs central finite differences with common random numbers).

The scene: a diffuse-textured floor, a glossy (Phong) panel, and an area
light. m_area=1/m_brdf=0 keeps the estimator smooth in the parameters
(single candidate: no WRS acceptance can flip under FD), so diffuse,
specular and emission gradients must match central differences tightly.
Shininess is validated directionally: the I_M normalization detaches the
incomplete-beta shape parameters (jax betainc has no a/b gradient —
tpu_restir/mathx/special.py), so autodiff carries only part of the
d/d(shininess) path by design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams)
from tpu_restir.diff.render import loss_fn
from tpu_restir.render import camera as cam_mod
from tpu_restir.scene.materials import MaterialSpec, MatType
from tpu_restir.scene.scene import build_scene

SIZE = 16
GLOSSY = 1  # material index of the glossy panel


def _quad(p0, p1, p2, p3):
    p0, p1, p2, p3 = (np.asarray(p, np.float32) for p in (p0, p1, p2, p3))
    return [np.stack([p0, p1, p2]), np.stack([p0, p2, p3])]


@pytest.fixture(scope="module")
def setup():
    tris, mats, uvs = [], [], []

    def add(ts, m, uv):
        tris.extend(ts)
        mats.extend([m] * len(ts))
        uvs.extend(uv)

    quv = [np.array([[0, 0], [1, 0], [1, 1]], np.float32),
           np.array([[0, 0], [1, 1], [0, 1]], np.float32)]
    # textured floor z=0
    add(_quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)), 0, quv)
    # glossy back panel y=+1 facing the camera
    add(_quad((-1, 1, 0), (1, 1, 0), (1, 1, 2), (-1, 1, 2)), GLOSSY, quv)
    # light overhead
    add(_quad((-0.4, 0.4, 1.9), (0.4, 0.4, 1.9), (0.4, -0.4, 1.9),
              (-0.4, -0.4, 1.9)), 2, quv)

    checker = np.indices((8, 8)).sum(0) % 2
    tex = (0.25 + 0.6 * checker)[..., None].repeat(3, -1).astype(np.float32)

    specs = [
        MaterialSpec("floor", MatType.LAMBERT, diffuse=(0.6, 0.55, 0.5),
                     tex_diffuse=0),
        MaterialSpec("glossy", MatType.PHONG, diffuse=(0.25, 0.3, 0.45),
                     specular=(0.4, 0.4, 0.4), shininess=60.0),
        MaterialSpec("light", MatType.LAMBERT, diffuse=(0.78, 0.78, 0.78),
                     emission=(14.0, 11.0, 6.0)),
    ]
    scene = build_scene(np.stack(tris), np.asarray(mats), specs,
                        vertex_uvs=np.stack(uvs),
                        textures=tex[None])
    ccfg = CameraConfig(width=SIZE, height=SIZE, fov_y_deg=55.0,
                        view_from=(0.0, -2.6, 1.0), view_at=(0.0, 0.0, 0.8),
                        pixel_sampler="center")
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       restir=RestirParams(m_area=1, m_brdf=0),
                       integrator="restir")
    cam = cam_mod.make_camera(ccfg)
    return scene, cfg, cam


def _fd(loss, params, field, idx, eps):
    hi = {**params, field: params[field].at[idx].add(eps)}
    lo = {**params, field: params[field].at[idx].add(-eps)}
    return (float(loss(hi)) - float(loss(lo))) / (2 * eps)


def test_glossy_textured_fd(setup):
    scene, cfg, cam = setup
    seeds = (0, 1)
    target = jnp.zeros((SIZE, SIZE, 3))
    params = {
        "diffuse": scene.materials.diffuse,
        "specular": scene.materials.specular,
        "emission": scene.materials.emission,
    }

    def loss(p):
        return loss_fn(p, scene, cam, cfg, seeds, target)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k

    checked = 0
    # glossy panel: specular + diffuse; light: emission — the glossy
    # regime BASELINE config 4 requires
    for field, entries in (("specular", [(GLOSSY, 0), (GLOSSY, 1)]),
                           ("diffuse", [(GLOSSY, 2)]),
                           ("emission", [(2, 0), (2, 2)])):
        for idx in entries:
            g = float(np.asarray(grads[field])[idx])
            if abs(g) < 1e-8:
                continue
            eps = 3e-3 if field != "emission" else 3e-2
            fd = _fd(loss, params, field, idx, eps)
            assert np.isclose(fd, g, rtol=0.08, atol=1e-6), (field, idx,
                                                             fd, g)
            checked += 1
    assert checked >= 4

    # textured floor: the texel REPLACES the flat diffuse color
    # (pg/material.cpp:105-116 semantics), so its diffuse gradient is 0
    assert np.allclose(np.asarray(grads["diffuse"])[0], 0.0, atol=1e-10)


def test_glossy_shininess_gradient_directional(setup):
    """Shininess gradient: autodiff drops the incomplete-beta shape-param
    path (detached by design), so validate direction and rough magnitude
    against FD rather than tight agreement."""
    scene, cfg, cam = setup
    seeds = (0,)

    def mean_img(p):
        from tpu_restir.diff.render import render_with_params

        return jnp.mean(render_with_params(p, scene, cam, cfg, seeds))

    params = {"shininess": scene.materials.shininess}
    g = float(np.asarray(jax.grad(mean_img)(params)["shininess"])[GLOSSY])
    eps = 2.0
    hi = {"shininess": params["shininess"].at[GLOSSY].add(eps)}
    lo = {"shininess": params["shininess"].at[GLOSSY].add(-eps)}
    fd = (float(mean_img(hi)) - float(mean_img(lo))) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    if abs(fd) > 1e-7:
        assert np.sign(g) == np.sign(fd), (g, fd)
        assert 0.1 < abs(g) / abs(fd) < 10.0, (g, fd)


@pytest.fixture(scope="module")
def setup_ts(setup):
    """Same geometry, but the back panel is a Torrance-Sparrow GGX
    material (eval-only, samples as Lambert — pg/MaterialTS.cpp:7-69)."""
    scene, cfg, cam = setup
    mats = scene.materials
    mat_type = mats.mat_type.at[GLOSSY].set(7)         # MatType.TS
    roughness = mats.roughness.at[GLOSSY].set(0.45)
    scene_ts = scene.replace(materials=mats.replace(mat_type=mat_type,
                                                    roughness=roughness))
    return scene_ts, cfg, cam


def test_ts_roughness_fd(setup_ts):
    """BASELINE config 4 'roughness': d(loss)/d(GGX roughness) of the TS
    panel matches central finite differences (the D/G/F terms are smooth
    in alpha; sampling is cosine-weighted so FD uses identical paths).

    The NEE integrator is the one where MaterialTS roughness is live —
    the screen-space ReSTIR layer maps TS to LAMBERT like the reference's
    MaterialTS::getType() (gbuffer.py:104-109), so its roughness gradient
    is structurally zero there."""
    scene, cfg, cam = setup_ts
    cfg = cfg.replace(integrator="nee", direct_strategy="mis")
    cfg = cfg.replace(params=cfg.params.__class__(
        use_skybox=False, max_bounce_count=2))
    seeds = (0, 1)
    target = jnp.zeros((SIZE, SIZE, 3))
    params = {"roughness": scene.materials.roughness}

    def loss(p):
        return loss_fn(p, scene, cam, cfg, seeds, target)

    g = float(np.asarray(jax.grad(loss)(params)["roughness"])[GLOSSY])
    assert np.isfinite(g) and abs(g) > 1e-8, g
    fd = _fd(loss, params, "roughness", GLOSSY, 5e-3)
    assert np.isclose(fd, g, rtol=0.08, atol=1e-6), (fd, g)


def test_texture_texel_fd(setup):
    """BASELINE config 4 'albedo' as a MAP: gradients flow to individual
    texels of the diffuse texture and match finite differences."""
    scene, cfg, cam = setup
    seeds = (0, 1)
    target = jnp.zeros((SIZE, SIZE, 3))
    params = {"tex_data": scene.textures.data}

    def loss(p):
        return loss_fn(p, scene, cam, cfg, seeds, target)

    grads = jax.grad(loss)(params)["tex_data"]
    ga = np.asarray(grads)
    assert np.isfinite(ga).all()
    assert (np.abs(ga) > 1e-8).sum() >= 4, "no texel received gradient"
    # FD-check the two strongest texels
    flat = np.argsort(np.abs(ga).ravel())[-2:]
    for f in flat:
        idx = np.unravel_index(int(f), ga.shape)
        g = float(ga[idx])
        fd = _fd(loss, params, "tex_data", idx, 3e-3)
        assert np.isclose(fd, g, rtol=0.08, atol=1e-6), (idx, fd, g)


def test_emission_cdf_caveat_guarded(setup):
    """The documented caveat (diff/params.py): emission-magnitude changes
    must NOT alter the light CDF (areas are geometry-derived, reference
    TriangleCDF semantics) — so emission gradients stay valid exactly
    because sampling probabilities are emission-independent."""
    from tpu_restir.diff.params import apply_params

    scene, cfg, cam = setup
    bumped = apply_params(
        scene, {"emission": scene.materials.emission * 3.0})
    np.testing.assert_array_equal(np.asarray(bumped.lights.cdf),
                                  np.asarray(scene.lights.cdf))
    np.testing.assert_array_equal(np.asarray(bumped.lights.tri_idx),
                                  np.asarray(scene.lights.tri_idx))
