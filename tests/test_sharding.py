"""Multi-chip correctness (SURVEY.md §4 item 4): the row-sharded ReSTIR
render must match the single-chip render — including spatial reuse taps
that cross shard borders (halo exchange) — on the 8-device virtual CPU
mesh configured in conftest.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir import rng
from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams)
from tpu_restir.dist.halo import extend_rows, halo_width
from tpu_restir.dist.mesh import make_mesh
from tpu_restir.dist.sharded import (device_put_replicated,
                                     device_put_row_sharded,
                                     make_sharded_restir_step)
from tpu_restir.render import camera as cam_mod
from tpu_restir.render.integrators.restir.pipeline import (
    init_restir_state, restir_step)
from tpu_restir.scene import cornell_box

N_DEV = 8
SIZE = 32


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(N_DEV)


def test_halo_exchange_matches_concat(mesh):
    """extend_rows must produce exactly the neighbor rows."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    h, w, halo = 32, 4, 2
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)

    def f(xl):
        return extend_rows(xl, halo, "tiles", N_DEV)

    try:
        ext = shard_map(f, mesh=mesh, in_specs=P("tiles"),
                        out_specs=P("tiles"), check_vma=False)(x)
    except TypeError:
        ext = shard_map(f, mesh=mesh, in_specs=P("tiles"),
                        out_specs=P("tiles"), check_rep=False)(x)
    ext = np.asarray(ext).reshape(N_DEV, h // N_DEV + 2 * halo, w)
    xl = np.asarray(x).reshape(N_DEV, h // N_DEV, w)
    for d in range(N_DEV):
        np.testing.assert_array_equal(ext[d, halo:-halo], xl[d])
        if d > 0:
            np.testing.assert_array_equal(ext[d, :halo], xl[d - 1, -halo:])
        if d < N_DEV - 1:
            np.testing.assert_array_equal(ext[d, -halo:], xl[d + 1, :halo])


@pytest.mark.parametrize("radius", [4.0, 30.0])
def test_sharded_restir_bitwise_parity(mesh, radius):
    """Full spatiotemporal ReSTIR: sharded == unsharded per pixel.

    Randomness is PCG4D on global coords, so results must agree to the
    last bit apart from (tolerated) float reassociation. radius=4 fits in
    the ppermute halo (halo-exchange mode); radius=30 exceeds the 4-row
    shards and exercises the all-gather fallback."""
    scene = cornell_box()
    ccfg = CameraConfig(width=SIZE, height=SIZE, fov_y_deg=45.0,
                        view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0),
                        pixel_sampler="random")
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       restir=RestirParams(
                           m_area=2, m_brdf=1, do_temporal_reuse=True,
                           do_spatial_reuse=True, spatial_neighbor_count=4,
                           spatial_reuse_radius=radius,
                           spatial_mis="pairwise"),
                       integrator="restir")
    cam = cam_mod.make_camera(ccfg)

    # single-chip reference
    step1 = jax.jit(restir_step, static_argnames=("cfg",))
    st1 = init_restir_state(SIZE, SIZE)
    frames1 = []
    for f in range(3):
        fr, st1 = step1(scene, cam, cfg, rng.make_frame_seed(0, f), st1,
                        jnp.asarray(f))
        frames1.append(np.asarray(fr))

    # sharded
    stepn = make_sharded_restir_step(mesh, cfg)
    stn = device_put_row_sharded(init_restir_state(SIZE, SIZE), mesh, SIZE)
    scene_r = device_put_replicated(scene, mesh)
    cam_r = device_put_replicated(cam, mesh)
    frames_n = []
    for f in range(3):
        fr, stn = stepn(scene_r, cam_r, rng.make_frame_seed(0, f), stn,
                        jnp.asarray(f))
        frames_n.append(np.asarray(fr))

    for f in range(3):
        a, b = frames1[f], frames_n[f]
        # EXACT equality: identical PCG4D draws + integer-exact neighbor
        # offsets (sampling.disk_int_from_uniform: table lookup keyed by
        # integer bits, no transcendental that could round differently
        # between the two compilations) make every sampling decision
        # bitwise identical; the remaining math is the same per-pixel
        # program on both sides. Round 4 tolerated 2% of pixels drifting
        # (float cos/sin -> trunc() flips); that source is gone.
        np.testing.assert_array_equal(a, b, err_msg=f"frame {f}")
