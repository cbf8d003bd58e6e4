import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir import rng
from tpu_restir.config import CameraConfig, RenderConfig, RenderParams
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.restir.gbuffer import gbuffer_fill
from tpu_restir.scene.materials import MaterialSpec, MatType
from tpu_restir.scene.scene import build_scene
from tpu_restir.scene.textures import (CLAMP, REPEAT, TextureStack,
                                        build_texture_stack, sample_bilinear,
                                        sample_stack)


def test_sample_bilinear_interp():
    img = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 1]],
                                [[1, 1, 1], [0, 0, 0]]], np.float32))
    # center of the image: average of the four corners = 0.5
    c = sample_bilinear(img, jnp.array([[0.5, 0.5]]))
    assert np.allclose(np.asarray(c), 0.5, atol=1e-5)
    # v=1 maps to the top row (y flip)
    tl = sample_bilinear(img, jnp.array([[0.0, 1.0]]))
    assert np.allclose(np.asarray(tl), 0.0, atol=1e-5)


def test_sample_stack_fallback():
    stack = TextureStack(data=jnp.ones((1, 4, 4, 3)),
                         sizes=jnp.asarray([[4, 4]], jnp.int32),
                         modes=jnp.zeros((1,), jnp.int32))
    fallback = jnp.full((2, 3), 0.25)
    uv = jnp.zeros((2, 2))
    out = sample_stack(stack, jnp.array([0, -1]), uv, fallback)
    assert np.allclose(np.asarray(out[0]), 1.0)
    assert np.allclose(np.asarray(out[1]), 0.25)


def test_native_resolution_and_modes():
    """Different-size textures keep native resolution in the padded stack;
    REPEAT wraps while CLAMP clamps."""
    big = np.zeros((16, 32, 3), np.float32)
    big[:, 16:] = 1.0                       # right half bright
    small = np.zeros((4, 4, 3), np.float32)
    small[0, 0] = 1.0                       # one bright texel, top-left
    stack = build_texture_stack([big, small], modes=[CLAMP, REPEAT])
    assert stack.data.shape == (2, 16, 32, 3)
    np.testing.assert_array_equal(np.asarray(stack.sizes), [[16, 32], [4, 4]])

    # native-res sampling: u=0.75 on the big texture = bright half
    uv = jnp.asarray([[0.75, 0.5], [0.25, 0.5]])
    out = sample_stack(stack, jnp.array([0, 0]), uv, jnp.zeros((2, 3)))
    assert np.asarray(out)[0, 0] > 0.9 and np.asarray(out)[1, 0] < 0.1

    # the small texture must NOT read the padding (padding is zero; texel
    # (0,0) of `small` sits at v=1 after the y-flip)
    out = sample_stack(stack, jnp.array([1]), jnp.asarray([[0.0, 1.0]]),
                       jnp.zeros((1, 3)))
    assert np.asarray(out)[0, 0] > 0.9


def test_repeat_vs_clamp_addressing():
    img = np.zeros((4, 4, 3), np.float32)
    img[:, 0] = 1.0                          # bright left column
    stack = build_texture_stack([img, img], modes=[CLAMP, REPEAT])
    # u slightly past 1: CLAMP stays on the right (dark) column; the
    # bilinear corner x0+1 wraps to column 0 (bright) under REPEAT
    uv = jnp.asarray([[1.2, 0.5]])
    c = sample_stack(stack, jnp.array([0]), uv, jnp.zeros((1, 3)))
    r = sample_stack(stack, jnp.array([1]), uv, jnp.zeros((1, 3)))
    assert np.asarray(c)[0, 0] < 0.05
    assert np.asarray(r)[0, 0] > 0.3


def _textured_quad_scene():
    # one quad facing -y, with a 2-tone diffuse texture: left half dark,
    # right half bright
    tris = np.array([
        [[-1, 1, -1], [1, 1, -1], [1, 1, 1]],
        [[-1, 1, -1], [1, 1, 1], [-1, 1, 1]],
    ], np.float32)
    uvs = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float32)
    tex = np.zeros((1, 8, 8, 3), np.float32)
    tex[0, :, 4:] = 0.9
    tex[0, :, :4] = 0.1
    specs = [MaterialSpec("tex", MatType.LAMBERT, diffuse=(0.5, 0.5, 0.5),
                          tex_diffuse=0)]
    return build_scene(tris, np.array([0, 0]), specs, vertex_uvs=uvs,
                       textures=tex)


def test_gbuffer_picks_up_texture():
    scene = _textured_quad_scene()
    ccfg = CameraConfig(width=16, height=16, view_from=(0, -2, 0),
                        view_at=(0, 0, 0), fov_y_deg=60.0)
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       integrator="restir")
    cam = cam_mod.make_camera(ccfg)
    ys, xs = jnp.meshgrid(jnp.arange(16), jnp.arange(16), indexing="ij")
    gb = gbuffer_fill(scene, cam, cfg, rng.make_frame_seed(0, 0), ys, xs)
    d = np.asarray(gb.diffuse)
    hit = np.asarray(gb.depth) > 0
    # at fov_y 60 the +-1 quad covers columns ~4..12 (half-extent at the
    # quad plane is 3*tan(30deg) ~= 1.73 world units)
    assert hit[8, 5] and hit[8, 11]
    # left side of the screen sees u near 0 -> dark; right side bright
    assert d[8, 5, 0] < 0.3
    assert d[8, 11, 0] > 0.7
