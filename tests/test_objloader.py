import os
import textwrap

import jax.numpy as jnp
import numpy as np

from tpu_restir.scene.materials import MatType
from tpu_restir.scene.objloader import load_obj_scene


def _write_scene(tmp_path):
    mtl = textwrap.dedent("""\
        newmtl lam
        Pc 1
        Kd 0.8 0.2 0.2
        Ks 0 0 0
        newmtl glossy
        Pc 2
        Kd 0.4 0.4 0.4
        Ks 0.5 0.5 0.5
        Ns 64
        newmtl lamp
        Pc 1
        Kd 0.8 0.8 0.8
        Ke 10 9 8
        newmtl untyped
        Kd 0.1 0.9 0.1
        Ks 0.2 0.2 0.2
    """)
    obj = textwrap.dedent("""\
        mtllib scene.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        v 0 0 1
        vn 0 0 1
        usemtl lam
        f 1//1 2//1 3//1
        usemtl glossy
        f 1//1 2//1 4//1
        usemtl lamp
        f 2//1 3//1 4//1
        usemtl untyped
        f 1 3 4
    """)
    (tmp_path / "scene.mtl").write_text(mtl)
    p = tmp_path / "scene.obj"
    p.write_text(obj)
    return str(p)


def test_obj_mtl_loading(tmp_path):
    scene = load_obj_scene(_write_scene(tmp_path))
    assert scene.num_tris == 4
    mt = np.asarray(scene.materials.mat_type)
    # Pc-as-type convention honored (pg/ModelLoader.cpp:52-72)
    assert mt[0] == MatType.LAMBERT
    assert mt[1] == MatType.PHONG
    assert mt[2] == MatType.LAMBERT
    # fallback: Ks > 0 without Pc -> PHONG
    assert mt[3] == MatType.PHONG
    # gamma expansion applied to Kd (0.8 -> ~0.603), not to Ke
    assert np.isclose(float(scene.materials.diffuse[0, 0]), 0.8 ** 2.4
                      if False else 0.6038, atol=0.01)
    assert np.allclose(np.asarray(scene.materials.emission[2]), [10, 9, 8])
    # emissive CDF collected exactly the lamp triangle
    assert scene.lights.count == 1
    assert np.asarray(scene.tri_mat)[int(scene.lights.tri_idx[0])] == 2
    # shininess and normals present
    assert float(scene.materials.shininess[1]) == 64.0
    n = np.asarray(scene.vtx_normal)
    assert np.allclose(np.linalg.norm(n[0], axis=-1), 1.0, atol=1e-5)


def test_obj_scene_renders(tmp_path):
    import jax

    from tpu_restir.config import CameraConfig, RenderConfig, RenderParams
    from tpu_restir.render import camera as cam_mod
    from tpu_restir.render.integrators.nee import render_nee

    scene = load_obj_scene(_write_scene(tmp_path))
    ccfg = CameraConfig(width=8, height=8, view_from=(2, -2, 2),
                        view_at=(0.2, 0.2, 0.2))
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       integrator="nee")
    cam = cam_mod.make_camera(ccfg)
    img = render_nee(scene, cam, cfg, jax.random.key(0))
    assert np.isfinite(np.asarray(img)).all()
