"""Pinhole camera: ray generation + reprojection matrices.

Faithful to the reference camera model (pg/camera.cpp:12-84): z-up
look-at frame, vertical-FOV focal length f_y = h / (2 tan(fov/2)),
camera-space direction (x - w/2, h/2 - y, -f_y) rotated to world by the
inverse view rotation. Rays for the whole image are generated in one
shaped op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_restir import mathx, rng
from tpu_restir.config import CameraConfig
from tpu_restir.render import sampling


class Camera(struct.PyTreeNode):
    pos: jnp.ndarray          # (3,)
    view_at: jnp.ndarray      # (3,)
    view_mat: jnp.ndarray     # (4, 4) world -> camera (glm::lookAt)
    inv_view_dir: jnp.ndarray  # (3, 3) camera -> world rotation
    focal: jnp.ndarray        # () f_y in pixels


def look_at(eye, at, up):
    """glm::lookAt — rows of R are (s, u, -f); t = (-s.e, -u.e, f.e)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = mathx.normalize(at - eye)
    s = mathx.normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s).at[0, 3].set(-jnp.dot(s, eye))
    m = m.at[1, :3].set(u).at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, :3].set(-f).at[2, 3].set(jnp.dot(f, eye))
    return m


def make_camera(cfg: CameraConfig, view_from=None, view_at=None) -> Camera:
    """Build the camera pytree. The orthonormal up (y_c) is recomputed from
    the fixed world up exactly like Camera::recalculate_m_c_w
    (pg/camera.cpp:44-58)."""
    eye = jnp.asarray(view_from if view_from is not None else cfg.view_from,
                      jnp.float32)
    at = jnp.asarray(view_at if view_at is not None else cfg.view_at,
                     jnp.float32)
    up = jnp.asarray(cfg.up, jnp.float32)
    z_c = mathx.normalize(eye - at)
    x_c = mathx.normalize(jnp.cross(up, z_c))
    y_c = mathx.normalize(jnp.cross(z_c, x_c))
    vm = look_at(eye, at, y_c)
    inv_dir = vm[:3, :3].T  # inverse of the rotation part
    focal = cfg.height / (2.0 * np.tan(np.radians(cfg.fov_y_deg) / 2.0))
    return Camera(pos=eye, view_at=at, view_mat=vm, inv_view_dir=inv_dir,
                  focal=jnp.asarray(focal, jnp.float32))


def generate_rays(cam: Camera, cfg: CameraConfig, key: jax.Array):
    """Primary rays for every pixel: origins (H, W, 3), unit dirs (H, W, 3).

    Pixel (x, y) + AA offset maps to camera-space direction
    (x+sx - w/2, h/2 - (y+sy), -f_y) (pg/camera.cpp:20-42). The CENTER
    sampler offset is (0,0) — the reference aims through pixel corners.
    """
    h, w = cfg.height, cfg.width
    jitter = sampling.pixel_offsets(
        rng.pass_key(key, rng.PASS_PIXEL_JITTER), (h, w),
        cfg.pixel_sampler, cfg.jitter_grid)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dx = xs + jitter[..., 0] - w / 2.0
    dy = h / 2.0 - (ys + jitter[..., 1])
    d_c = jnp.stack([dx, dy, -jnp.broadcast_to(cam.focal, dx.shape)], axis=-1)
    d_w = mathx.normalize(jnp.einsum("ij,hwj->hwi", cam.inv_view_dir, d_c))
    o = jnp.broadcast_to(cam.pos, d_w.shape)
    return o, d_w


def project_to_screen(cam_view_mat, focal, width, height, ws_pos):
    """World position -> integer pixel coords + validity, per the
    reference reprojection (pg/ReSTIRIntegrator.cpp:544-565).

    Returns (x, y, valid); invalid when behind the camera or off screen.
    """
    p = ws_pos
    vx = (cam_view_mat[0, :3] * p).sum(-1) + cam_view_mat[0, 3]
    vy = (cam_view_mat[1, :3] * p).sum(-1) + cam_view_mat[1, 3]
    vz = (cam_view_mat[2, :3] * p).sum(-1) + cam_view_mat[2, 3]
    in_front = vz < 0.0
    vz_safe = jnp.where(in_front, vz, -1.0)
    sx = jnp.round((-vx / vz_safe) * focal + width / 2.0).astype(jnp.int32)
    sy = jnp.round((vy / vz_safe) * focal + height / 2.0).astype(jnp.int32)
    on_screen = (sx >= 0) & (sx <= width - 1) & (sy >= 0) & (sy <= height - 1)
    valid = in_front & on_screen
    return sx, sy, valid
