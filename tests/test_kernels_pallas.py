"""Interpret-mode parity tests for the Pallas TPU kernels.

The hottest code in the repo (kernels/local_gather.py, kernels/ray_tri.py)
is unreachable on the CPU suite in compiled form; these tests run the
SAME kernels through the Pallas interpreter (pl.pallas_call interpret=True)
and check them against the XLA fallback paths they replace:

  * gather_local       vs packed.gather_packed (flat row gather)
  * gather_local VJP   vs the XLA .at[].add scatter transpose
  * ray_tri closest/any vs the brute Moller-Trumbore backend
  * ray_tri closest VJP vs autodiff of the brute backend
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir.config import IntersectorConfig
from tpu_restir.kernels import local_gather as lg
from tpu_restir.kernels import ray_tri
from tpu_restir.render import intersect
from tpu_restir.render.integrators.restir import packed as pk
from tpu_restir.scene import cornell_box


@pytest.fixture(autouse=True)
def _interpret_kernels():
    lg.INTERPRET = True
    ray_tri.INTERPRET = True
    yield
    lg.INTERPRET = False
    ray_tri.INTERPRET = False


def _taps(rng, h, w, k, r):
    ys = np.arange(h)[None, :, None] + rng.integers(-r, r + 1, (k, h, w))
    xs = np.arange(w)[None, None, :] + rng.integers(-r, r + 1, (k, h, w))
    return (jnp.asarray(np.clip(ys, 0, h - 1), jnp.int32),
            jnp.asarray(np.clip(xs, 0, w - 1), jnp.int32))


def test_gather_local_matches_packed_gather():
    rng = np.random.default_rng(7)
    h, w, c, k, r = 16, 128, 6, 5, 5
    payload = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    tys, txs = _taps(rng, h, w, k, r)
    got = lg.gather_local(payload, tys, txs, r)
    want = pk.gather_packed(payload, tys, txs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_local_identity_taps():
    rng = np.random.default_rng(8)
    h, w, c = 8, 128, 3
    payload = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[None, :, None],
                          (1, h, w))
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, None, :],
                          (1, h, w))
    got = lg.gather_local(payload, ys, xs, 2)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(payload))


def test_gather_local_vjp_matches_scatter_add():
    """The Pallas scatter-transpose backward == XLA .at[].add transpose."""
    rng = np.random.default_rng(9)
    h, w, c, k, r = 16, 128, 4, 3, 4
    payload = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    tys, txs = _taps(rng, h, w, k, r)
    cot = jnp.asarray(rng.standard_normal((k, h, w, c)), jnp.float32)

    def loss_kernel(p):
        return jnp.sum(lg.gather_local(p, tys, txs, r) * cot)

    def loss_ref(p):
        return jnp.sum(pk.gather_packed(p, tys, txs) * cot)

    g_kernel = jax.grad(loss_kernel)(payload)
    g_ref = jax.grad(loss_ref)(payload)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_gather_local_halo_extended_payload():
    """ext_top > 0: taps into a halo-extended strip (the sharded spatial
    pass) must match the flat row gather, forward and backward."""
    rng = np.random.default_rng(10)
    h, w, c, k, r, halo = 16, 128, 5, 4, 4, 6
    eh = h + 2 * halo
    payload = jnp.asarray(rng.standard_normal((eh, w, c)), jnp.float32)
    # taps in payload coords: |tys - (row + halo)| <= r
    ys = np.arange(h)[None, :, None] + halo \
        + rng.integers(-r, r + 1, (k, h, w))
    xs = np.arange(w)[None, None, :] + rng.integers(-r, r + 1, (k, h, w))
    tys = jnp.asarray(np.clip(ys, 0, eh - 1), jnp.int32)
    txs = jnp.asarray(np.clip(xs, 0, w - 1), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((k, h, w, c)), jnp.float32)

    got = lg.gather_local(payload, tys, txs, r, top=halo)
    want = pk.gather_packed(payload, tys, txs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    g_k = jax.grad(lambda p: jnp.sum(
        lg.gather_local(p, tys, txs, r, top=halo) * cot))(payload)
    g_r = jax.grad(lambda p: jnp.sum(
        pk.gather_packed(p, tys, txs) * cot))(payload)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-6, atol=1e-6)


def _random_rays(rng, scene_extent, n):
    o = rng.uniform(-scene_extent, scene_extent, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_ray_tri_closest_matches_brute():
    scene = cornell_box()
    rng = np.random.default_rng(11)
    n = 256
    o, d = _random_rays(rng, 2.0, n)
    tn = jnp.full((n,), 1e-3, jnp.float32)
    tf = jnp.full((n,), 1e4, jnp.float32)

    t_k, u_k, v_k, tri_k = ray_tri.closest_hit(scene, o, d, tn, tf)
    brute = intersect.intersect_closest(
        scene, o, d, tn, tf, IntersectorConfig(backend="brute"))

    hit_k = np.asarray(tri_k >= 0)
    np.testing.assert_array_equal(hit_k, np.asarray(brute.hit))
    m = hit_k
    np.testing.assert_allclose(np.asarray(t_k)[m], np.asarray(brute.t)[m],
                               rtol=1e-4, atol=1e-5)
    # winning triangle: identical except where two triangles tie on t
    # (coplanar quads — e.g. the light panel in the ceiling plane — where
    # the Woop and Moller-Trumbore formulations round ties differently)
    diff = m & (np.asarray(tri_k) != np.asarray(brute.tri))
    assert np.all(np.abs(np.asarray(t_k)[diff] - np.asarray(brute.t)[diff])
                  <= 1e-3 * np.abs(np.asarray(brute.t)[diff]) + 1e-5)
    same = m & ~diff
    np.testing.assert_allclose(np.asarray(u_k)[same],
                               np.asarray(brute.u)[same],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_k)[same],
                               np.asarray(brute.v)[same],
                               rtol=1e-3, atol=1e-4)


def test_ray_tri_any_matches_brute():
    scene = cornell_box()
    rng = np.random.default_rng(12)
    n = 256
    o, d = _random_rays(rng, 2.0, n)
    tn = jnp.full((n,), 1e-3, jnp.float32)
    tf = jnp.full((n,), 3.0, jnp.float32)

    occ_k = ray_tri.any_hit(scene, o, d, tn, tf)
    occ_b = intersect.intersect_any(
        scene, o, d, tn, tf, IntersectorConfig(backend="brute"))
    np.testing.assert_array_equal(np.asarray(occ_k), np.asarray(occ_b))


def test_ray_tri_closest_vjp_matches_brute_autodiff():
    """The analytic closest-hit VJP (d(t,u,v)/d(o,d) of the winning Woop
    transform) must agree with autodiff through the brute backend."""
    scene = cornell_box()
    rng = np.random.default_rng(13)
    n = 64
    o, d = _random_rays(rng, 1.5, n)
    tn = jnp.full((n,), 1e-3, jnp.float32)
    tf = jnp.full((n,), 1e4, jnp.float32)
    gt = jnp.asarray(rng.standard_normal(n), jnp.float32)
    gu = jnp.asarray(rng.standard_normal(n), jnp.float32)
    gv = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def loss_kernel(o_, d_):
        t, u, v, tri = ray_tri.closest_hit(scene, o_, d_, tn, tf)
        m = (tri >= 0).astype(jnp.float32)
        t = jnp.where(tri >= 0, t, 0.0)
        return jnp.sum(m * (gt * t + gu * u + gv * v))

    def loss_brute(o_, d_):
        hit = intersect.intersect_closest(
            scene, o_, d_, tn, tf, IntersectorConfig(backend="brute"))
        m = hit.hit.astype(jnp.float32)
        return jnp.sum(m * (gt * hit.t + gu * hit.u + gv * hit.v))

    go_k, gd_k = jax.grad(loss_kernel, argnums=(0, 1))(o, d)
    go_b, gd_b = jax.grad(loss_brute, argnums=(0, 1))(o, d)
    np.testing.assert_allclose(np.asarray(go_k), np.asarray(go_b),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gd_k), np.asarray(gd_b),
                               rtol=2e-3, atol=2e-3)


def test_gather_local_vjp_disk_bounded_taps():
    """disk_r2 lets the scatter kernel skip impossible offset combos;
    with genuinely disk-sampled taps the gradient must still equal the
    XLA scatter-add transpose exactly."""
    rng = np.random.default_rng(19)
    h, w, c, k, rad2 = 16, 128, 6, 5, 30.0
    payload = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, (k, h, w))
    rad = np.sqrt(rng.uniform(0, rad2, (k, h, w)))
    dy = np.trunc(rad * np.sin(ang)).astype(np.int64)
    dx = np.trunc(rad * np.cos(ang)).astype(np.int64)
    tys = jnp.asarray(np.clip(np.arange(h)[None, :, None] + dy, 0, h - 1),
                      jnp.int32)
    txs = jnp.asarray(np.clip(np.arange(w)[None, None, :] + dx, 0, w - 1),
                      jnp.int32)

    def loss(p, disk_r2):
        return jnp.sum(lg.gather_local(p, tys, txs, 5, 0, disk_r2) ** 2)

    g_disk = jax.grad(lambda p: loss(p, int(rad2)))(payload)
    # reference: XLA scatter-add transpose (kernel path disabled)
    old = lg.SCATTER_KERNEL
    lg.SCATTER_KERNEL = False
    try:
        g_ref = jax.grad(lambda p: loss(p, None))(payload)
    finally:
        lg.SCATTER_KERNEL = old
    np.testing.assert_allclose(np.asarray(g_disk), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
