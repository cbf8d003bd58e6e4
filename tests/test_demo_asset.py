"""Bundled demo asset end-to-end golden (reference parity:
pg/ModelLoader.cpp:18-321 + pg/tutorials.cpp:27-42 — load a textured
OBJ/MTL with the Pc material-type convention, an HDR env map, render,
export PNG + sidecar).

The asset (assets/demo/, regenerable via make_demo.py) exercises all six
Pc material classes, diffuse/specular/normal texture slots, and the
equirect environment; the CLI render is pinned to a golden image mean
and the sidecar must carry the reference's field layout.
"""

import os

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMO = os.path.join(_ROOT, "assets", "demo")

# goldens for: 48x32, 4 frames, seed 123, ReSTIR temporal+spatial
# pairwise m_area=2, skybox env.pfm (recorded on the CPU backend,
# round 5 — integer-table spatial offsets). _GOLDEN_REGIONS are 4x4
# display-space (tonemapped PNG) region means: a mean-only pin can pass
# with visibly wrong images (r4 Weak #5); per-region pins catch
# misplaced geometry, broken textures, or a dead env map.
_GOLDEN_MEAN = 0.536838
_GOLDEN_REGIONS = [
    [0.7129, 0.5927, 0.5785, 0.7047],
    [0.6801, 0.5566, 0.5822, 0.6730],
    [0.3819, 0.3869, 0.4031, 0.4196],
    [0.3443, 0.4356, 0.4319, 0.3574],
]


def test_demo_asset_covers_all_material_types_and_textures():
    from tpu_restir.scene.envmap import load_hdr
    from tpu_restir.scene.materials import MatType
    from tpu_restir.scene.objloader import load_obj_scene

    scene = load_obj_scene(os.path.join(_DEMO, "demo.obj"))
    types = set(int(t) for t in np.asarray(scene.materials.mat_type))
    want = {MatType.NORMAL, MatType.LAMBERT, MatType.PHONG, MatType.MIRROR,
            MatType.DIELECTRIC, MatType.TRANSPARENT}
    assert want <= types, (types, want)
    # texture slots: diffuse checker, specular map, normal map all wired
    assert scene.textures is not None and scene.textures.data.shape[0] == 3
    tex = np.asarray(scene.materials.tex_index)  # (M, 4) d/s/shin/norm
    assert tex[:, 0].max() >= 0  # diffuse map wired
    assert tex[:, 1].max() >= 0  # specular map wired
    assert tex[:, 3].max() >= 0  # normal map wired
    # emissive panel feeds the light CDF
    assert scene.lights.is_valid
    env = load_hdr(os.path.join(_DEMO, "env.pfm"))
    assert env.shape == (32, 64, 3) and env.max() > 5.0  # HDR sun


def test_demo_cli_render_matches_golden(tmp_path):
    from tpu_restir import cli

    out = str(tmp_path / "demo.png")
    rc = cli.main([
        "--scene", os.path.join(_DEMO, "demo.obj"), "--size", "48x32",
        "--fov", "50", "--view-from", "0,-6.0,2.1",
        "--view-at", "0,0.4,0.7", "--frames", "4", "--temporal",
        "--spatial", "--spatial-mis", "pairwise", "--m-area", "2",
        "--skybox", os.path.join(_DEMO, "env.pfm"), "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    sidecar = out + ".txt"
    text = open(sidecar).read()
    # reference sidecar field layout (pg/simpleguidx11.cpp:627-649)
    for field in ("Iteration count: 4", "Area samples: 2",
                  "BRDF samples: 1", "Spatial reuse: True",
                  "Temporal reuse: True", "Image mean:",
                  "Image variance:", "Camera vertical FOV: 50"):
        assert field in text, field
    mean = float(text.split("Image mean:")[1].split()[0])
    assert abs(mean - _GOLDEN_MEAN) < 0.02 * _GOLDEN_MEAN, mean
    from PIL import Image
    img = np.asarray(Image.open(out), np.float32)[:, :, :3] / 255.0
    reg = img.reshape(4, 8, 4, 12, 3).mean(axis=(1, 3, 4))
    np.testing.assert_allclose(reg, np.asarray(_GOLDEN_REGIONS),
                               atol=0.04)
