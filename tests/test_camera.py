import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.config import CameraConfig
from tpu_restir.render import camera as cam_mod


def test_projection_roundtrip():
    """Fixed version of the reference's dormant testReprojection invariant
    (pg/ReSTIRIntegrator.cpp:591-622): forward-projecting a point on a
    primary ray must land on its own pixel."""
    ccfg = CameraConfig(width=64, height=48, fov_y_deg=55.0,
                        view_from=(1.9, -7.7, 1.6), view_at=(0.0, 0.0, 0.0))
    cam = cam_mod.make_camera(ccfg)
    o, d = cam_mod.generate_rays(cam, ccfg, jax.random.key(0))
    pts = o + d * 3.7  # arbitrary depth along each ray
    sx, sy, valid = cam_mod.project_to_screen(
        cam.view_mat, cam.focal, ccfg.width, ccfg.height, pts)
    ys, xs = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    assert np.asarray(valid).all()
    assert np.array_equal(np.asarray(sx), xs)
    assert np.array_equal(np.asarray(sy), ys)


def test_rays_unit_and_forward():
    ccfg = CameraConfig(width=16, height=16, fov_y_deg=45.0,
                        view_from=(0, -3, 1), view_at=(0, 0, 1))
    cam = cam_mod.make_camera(ccfg)
    o, d = cam_mod.generate_rays(cam, ccfg, jax.random.key(0))
    dn = np.linalg.norm(np.asarray(d), axis=-1)
    assert np.allclose(dn, 1.0, atol=1e-5)
    fwd = np.asarray(cam.view_at - cam.pos)
    fwd = fwd / np.linalg.norm(fwd)
    assert (np.asarray(d) @ fwd > 0).all()


def test_focal_length():
    ccfg = CameraConfig(width=1280, height=720, fov_y_deg=55.0)
    cam = cam_mod.make_camera(ccfg)
    expected = 720 / (2 * np.tan(np.radians(55.0) / 2))
    assert np.isclose(float(cam.focal), expected, rtol=1e-6)


def test_behind_camera_invalid():
    ccfg = CameraConfig(width=32, height=32, view_from=(0, -3, 1),
                        view_at=(0, 0, 1))
    cam = cam_mod.make_camera(ccfg)
    behind = jnp.array([[0.0, -10.0, 1.0]])
    _, _, valid = cam_mod.project_to_screen(cam.view_mat, cam.focal, 32, 32,
                                            behind)
    assert not bool(valid[0])
