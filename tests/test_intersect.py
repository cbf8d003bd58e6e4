import jax.numpy as jnp
import numpy as np

from tpu_restir.config import IntersectorConfig, RenderParams
from tpu_restir.render import intersect
from tpu_restir.scene import cornell_box
from tpu_restir.scene.materials import MaterialSpec, MatType
from tpu_restir.scene.scene import build_scene


def _two_tri_scene():
    # two parallel triangles facing -y at y=1 and y=2
    tris = np.array([
        [[-1, 1, -1], [1, 1, -1], [0, 1, 1]],
        [[-1, 2, -1], [1, 2, -1], [0, 2, 1]],
    ], np.float32)
    specs = [MaterialSpec("a", MatType.LAMBERT),
             MaterialSpec("b", MatType.LAMBERT, emission=(1, 1, 1))]
    return build_scene(tris, np.array([0, 1]), specs)


def test_closest_hit_orders():
    scene = _two_tri_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    hit = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf)
    assert bool(hit.hit[0])
    assert int(hit.tri[0]) == 0
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)


def test_miss():
    scene = _two_tri_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    hit = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf)
    assert not bool(hit.hit[0])
    assert int(hit.tri[0]) == -1


def test_occlusion():
    scene = _two_tri_scene()
    p = RenderParams()
    frm = jnp.array([[0.0, 0.0, 0.0]])
    to = jnp.array([[0.0, 2.0, 0.0]])  # tri 0 sits between
    occ = intersect.test_occlusion(scene, frm, to, p)
    assert bool(occ[0])
    # to the first triangle itself: tfar epsilon excludes the target surface
    to1 = jnp.array([[0.0, 1.0, 0.0]])
    occ1 = intersect.test_occlusion(scene, frm, to1, p)
    assert not bool(occ1[0])


def test_hit_attributes_flip():
    scene = _two_tri_scene()
    # from behind the first triangle: normal must flip, from_inside=True
    o = jnp.array([[0.0, 1.5, 0.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    hit = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf)
    hi = intersect.hit_attributes(scene, o, d, hit)
    # geometric normal of tri 0 points -y; seen from +y side it flips to +y
    assert bool(hi.from_inside[0])
    assert float(hi.normal[0, 1]) > 0.9


def test_chunking_consistency():
    scene = cornell_box()
    rng = np.random.default_rng(0)
    n = 500
    o = jnp.asarray(np.tile([[0.0, -3.5, 1.0]], (n, 1)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = np.abs(d[:, 1])  # toward the box
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    a = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf,
                                    IntersectorConfig(ray_chunk=64,
                                                      tri_block=8))
    b = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf,
                                    IntersectorConfig())
    assert np.array_equal(np.asarray(a.tri), np.asarray(b.tri))
    assert np.allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-5)


def test_cornell_primary_hits():
    from tpu_restir.config import CameraConfig
    from tpu_restir.render import camera as cam_mod
    import jax

    scene = cornell_box()
    ccfg = CameraConfig(width=32, height=32, fov_y_deg=45.0,
                        view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0))
    cam = cam_mod.make_camera(ccfg)
    o, d = cam_mod.generate_rays(cam, ccfg, jax.random.key(0))
    hit = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf)
    # every central ray should hit the box interior
    assert np.asarray(hit.hit)[8:24, 8:24].all()
