"""Worker for tests/test_multihost.py — runs in a subprocess as one of
two jax.distributed processes (4 virtual CPU devices each, 8 global).

usage: python tests/multihost_worker.py <coordinator> <num_procs> <pid>

Renders 2 row-sharded ReSTIR frames over the GLOBAL 8-device mesh,
compares the process-local shard against a locally computed single-chip
reference, and prints machine-readable OK + halo-traffic stats.
"""

import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from tpu_restir.dist.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from tpu_restir import rng
    from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                                   RestirParams)
    from tpu_restir.dist.halo import halo_width
    from tpu_restir.dist.sharded import (device_put_replicated,
                                         device_put_row_sharded,
                                         make_sharded_restir_step)
    from tpu_restir.render import camera as cam_mod
    from tpu_restir.render.integrators.restir.pipeline import (
        init_restir_state, restir_step)
    from tpu_restir.scene import cornell_box

    size = 32
    radius = 4.0
    scene = cornell_box()
    ccfg = CameraConfig(width=size, height=size, fov_y_deg=45.0,
                        view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0),
                        pixel_sampler="random")
    cfg = RenderConfig(camera=ccfg, params=RenderParams(use_skybox=False),
                       restir=RestirParams(
                           m_area=1, m_brdf=1, do_spatial_reuse=True,
                           spatial_neighbor_count=3,
                           spatial_reuse_radius=radius,
                           spatial_mis="pairwise"),
                       integrator="restir")
    cam = cam_mod.make_camera(ccfg)

    # local single-chip reference (identical on both processes)
    step1 = jax.jit(restir_step, static_argnames=("cfg",))
    st1 = init_restir_state(size, size)
    ref = []
    for f in range(2):
        fr, st1 = step1(scene, cam, cfg, rng.make_frame_seed(0, f), st1,
                        jnp.asarray(f))
        ref.append(np.asarray(fr))

    # global 8-device mesh spanning both processes
    mesh = make_mesh(8)
    stepn = make_sharded_restir_step(mesh, cfg)
    stn = device_put_row_sharded(init_restir_state(size, size), mesh, size)
    scene_r = device_put_replicated(scene, mesh)
    cam_r = device_put_replicated(cam, mesh)
    for f in range(2):
        fr, stn = stepn(scene_r, cam_r, rng.make_frame_seed(0, f), stn,
                        jnp.asarray(f))
        # compare only this process's addressable shards — EXACT: all
        # sampling decisions are integer-exact across compilations
        # (PCG4D keyed by global coords + table-based neighbor offsets,
        # see tests/test_sharding.py)
        for sh in fr.addressable_shards:
            rows = sh.index[0]
            a = ref[f][rows]
            b = np.asarray(sh.data)
            np.testing.assert_array_equal(a, b, err_msg=f"frame {f}")

    halo = halo_width(radius)
    # reservoir+G-buffer reuse payload: 32 packed f32 channels (24 for
    # Lambert-only scenes like this one — packed.py slim layout);
    # each device exchanges `halo` rows with each neighbor, both ways
    halo_bytes = 2 * 2 * halo * size * 24 * 4
    print(f"MULTIHOST_OK pid={pid} procs={nproc} halo_rows={halo} "
          f"halo_bytes_per_frame_per_device={halo_bytes}")


if __name__ == "__main__":
    main()
