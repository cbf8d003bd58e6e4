"""Sharded differentiable rendering parity (VERDICT round 1, item 2).

value_and_grad of the ReSTIR pixel loss over the virtual 8-device CPU
mesh must match the single-chip estimator: frames are bit-identical
(PCG4D keyed by global pixel coords), so value and every material
gradient agree up to reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams)
from tpu_restir.diff.params import extract_params
from tpu_restir.diff.render import make_value_and_grad
from tpu_restir.dist.diff import make_sharded_value_and_grad
from tpu_restir.dist.mesh import make_mesh
from tpu_restir.render import camera as cam_mod
from tpu_restir.scene import cornell_box

N_DEV = 8


def _cfg(h=16, w=16):
    return RenderConfig(
        camera=CameraConfig(width=w, height=h, fov_y_deg=45.0,
                            view_from=(0.0, -3.9, 1.0),
                            view_at=(0.0, 0.0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=2, m_brdf=1, do_temporal_reuse=True,
                            do_spatial_reuse=True, spatial_neighbor_count=3,
                            spatial_mis="pairwise"),
        integrator="restir", n_devices=N_DEV)


def test_sharded_grads_match_single_chip():
    cfg = _cfg()
    scene = cornell_box()
    cam = cam_mod.make_camera(cfg.camera)
    seeds = (0, 1)
    rng_np = np.random.default_rng(5)
    target = jnp.asarray(
        rng_np.uniform(0, 1, (cfg.camera.height, cfg.camera.width, 3)),
        jnp.float32)
    params = extract_params(scene)

    v1, g1 = make_value_and_grad(scene, cam, cfg, seeds, target)(params)
    mesh = make_mesh(N_DEV, cfg.mesh_axis)
    v8, g8 = make_sharded_value_and_grad(scene, cam, cfg, seeds, target,
                                         mesh)(params)

    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-5)
    flat1 = jax.tree.leaves(g1)
    flat8 = jax.tree.leaves(g8)
    assert len(flat1) == len(flat8)
    any_nonzero = False
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
        any_nonzero |= bool(jnp.any(jnp.abs(a) > 0))
    assert any_nonzero, "gradients vanished — estimator is broken"
