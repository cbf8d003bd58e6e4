"""Packet-traversal (ptrace) backend tests — the production large-scene
path (round 4; replaces fcluster's lockstep XLA rounds as the auto
choice on TPU).

Oracles: hit-for-hit parity with the brute backend on coherent and
incoherent ray sets (same Möller-Trumbore op sequence => identical t on
the winning triangle up to tie order), tile-swizzle transparency, dead
rays, odd (padding) ray counts, and detached-winner gradients matching
the fcluster/brute convention. Kernels run through the Pallas
interpreter on the CPU suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir.config import IntersectorConfig
from tpu_restir.kernels import cluster_trace as ct
from tpu_restir.render import intersect
from tpu_restir.scene.procedural import terrain_scene, triangle_soup

_PT = IntersectorConfig(backend="ptrace")
_BRUTE = IntersectorConfig(backend="brute")


@pytest.fixture(autouse=True)
def _interpret_kernels():
    ct.INTERPRET = True
    yield
    ct.INTERPRET = False


def _rays(rng, n, extent):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tn = jnp.full((n,), 1e-3, jnp.float32)
    tf = jnp.full((n,), 1e4, jnp.float32)
    return jnp.asarray(o), jnp.asarray(d), tn, tf


def _assert_closest_parity(hb, hv):
    np.testing.assert_array_equal(np.asarray(hv.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    diff = m & (np.asarray(hv.tri) != np.asarray(hb.tri))
    # same MT op sequence, but the kernel's (tris, rays) broadcast
    # orientation lets the compiler contract different FMAs than brute's
    # (rays, tris) — tolerate ulp-level drift; winners may differ only
    # on (near-)ties
    np.testing.assert_allclose(np.asarray(hv.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-5, atol=1e-6)
    assert diff.mean() < 0.01


def test_ptrace_matches_brute_incoherent():
    scene = triangle_soup(1500)
    rng = np.random.default_rng(31)
    o, d, tn, tf = _rays(rng, 700, 2.0)   # 700: not a packet multiple
    hb = intersect.intersect_closest(scene, o, d, tn, tf, _BRUTE)
    hv = intersect.intersect_closest(scene, o, d, tn, tf, _PT)
    _assert_closest_parity(hb, hv)
    tfs = jnp.full((o.shape[0],), 1.5, jnp.float32)
    ob = intersect.intersect_any(scene, o, d, tn, tfs, _BRUTE)
    ov = intersect.intersect_any(scene, o, d, tn, tfs, _PT)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ob))


def test_ptrace_matches_brute_coherent_2d_swizzle():
    """2-D pixel-grid rays exercise the 8x32 tile-swizzle path; results
    must be identical to the unswizzled flat call and to brute."""
    scene = terrain_scene(5_000)
    rng = np.random.default_rng(32)
    h, w = 16, 64
    o = np.tile(np.array([0.0, -6.0, 4.0], np.float32), (h * w, 1))
    at = rng.uniform(-4, 4, (h * w, 3)).astype(np.float32)
    at[:, 2] = 0.3
    d = at - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o2 = jnp.asarray(o.reshape(h, w, 3))
    d2 = jnp.asarray(d.reshape(h, w, 3))
    tn, tf = jnp.float32(1e-3), jnp.float32(1e4)
    hb = intersect.intersect_closest(scene, o2, d2, tn, tf, _BRUTE)
    hv = intersect.intersect_closest(scene, o2, d2, tn, tf, _PT)
    _assert_closest_parity(hb, hv)
    hflat = intersect.intersect_closest(scene, jnp.asarray(o),
                                        jnp.asarray(d), tn, tf, _PT)
    np.testing.assert_array_equal(np.asarray(hv.t).reshape(-1),
                                  np.asarray(hflat.t))
    ob = intersect.intersect_any(scene, o2, d2, tn, tf, _BRUTE)
    ov = intersect.intersect_any(scene, o2, d2, tn, tf, _PT)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ob))


def test_ptrace_dead_rays_and_bounded_segments():
    """Dead rays (tfar < tnear) must report miss/visible and must not
    poison their packet; bounded shadow segments match brute."""
    scene = terrain_scene(5_000)
    rng = np.random.default_rng(33)
    o, d, tn, tf = _rays(rng, 512, 4.0)
    tfm = tf.at[::3].set(-1.0)
    hb = intersect.intersect_closest(scene, o, d, tn, tfm, _BRUTE)
    hv = intersect.intersect_closest(scene, o, d, tn, tfm, _PT)
    _assert_closest_parity(hb, hv)
    assert not np.asarray(hv.hit)[::3].any()
    dist = jnp.full((512,), 2.0, jnp.float32)
    ob = intersect.intersect_any(scene, o, d, tn, dist, _BRUTE)
    ov = intersect.intersect_any(scene, o, d, tn, dist, _PT)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ob))
    # any-hit with dead segments (tfar < tnear): dead rays must report
    # visible (False) — run the query with the dead-ray tfar itself
    ovm = intersect.intersect_any(scene, o, d, tn, tfm, _PT)
    assert not np.asarray(ovm)[np.asarray(tfm) < np.asarray(tn)].any()


def test_ptrace_detached_winner_grad_matches_brute():
    """d(t)/d(o,d) through the ptrace query equals brute autodiff at
    hit points (detached-winner convention, same as fcluster)."""
    scene = terrain_scene(3_000)
    rng = np.random.default_rng(34)
    n = 300
    o = np.tile(np.array([0.0, -5.0, 3.0], np.float32), (n, 1))
    at = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    at[:, 2] = 0.2
    d = at - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tn, tf = jnp.float32(1e-3), jnp.float32(1e4)

    def loss(cfg):
        def f(o, d):
            h = intersect.intersect_closest(scene, o, d, tn, tf, cfg)
            return jnp.sum(jnp.where(h.hit, h.t, 0.0))
        return jax.grad(f, argnums=(0, 1))(o, d)

    go_b, gd_b = loss(_BRUTE)
    go_p, gd_p = loss(_PT)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_b),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_b),
                               rtol=2e-4, atol=2e-5)


def test_ptrace_supercluster_factor_matches_flat():
    """factor > 1 (supercluster shortlists — the SMEM-bounded large-scene
    scheme) must reproduce the flat factor=1 results exactly: the
    expansion tests the same clusters, only grouped differently in
    phase 1."""
    scene = terrain_scene(20_000)
    rng = np.random.default_rng(35)
    o, d, tn, tf = _rays(rng, 768, 5.0)
    args = (scene.cluster_tris, scene.cluster_min, scene.cluster_max,
            o, d, tn, tf)
    t1, u1, v1, tri1 = ct.trace_closest(*args, factor=1)
    t4, u4, v4, tri4 = ct.trace_closest(*args, factor=4)
    np.testing.assert_array_equal(np.asarray(tri4), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(t4), np.asarray(t1))
    tfs = jnp.full((768,), 3.0, jnp.float32)
    a1 = ct.trace_any(scene.cluster_tris, scene.cluster_min,
                      scene.cluster_max, o, d, tn, tfs, factor=1)
    a4 = ct.trace_any(scene.cluster_tris, scene.cluster_min,
                      scene.cluster_max, o, d, tn, tfs, factor=4)
    np.testing.assert_array_equal(np.asarray(a4), np.asarray(a1))
    # and against brute, via the full backend path
    hb = intersect.intersect_closest(scene, o, d, tn, tf, _BRUTE)
    hit4 = np.asarray(tri4) >= 0
    np.testing.assert_array_equal(hit4, np.asarray(hb.hit))


def test_ptrace_mxu_variant_matches_brute():
    """The optional Woop/MXU traversal kernels (cluster_size=128 scenes,
    ptrace_mxu=True) must agree with brute up to the watertight epsilon
    (HIGHEST-precision matmuls; kernels/woop.py semantics)."""
    from tpu_restir.scene.materials import MaterialSpec, MatType
    from tpu_restir.scene.procedural import terrain_scene

    scene = terrain_scene(5_000)
    # rebuild at the MXU block size
    import numpy as _np

    from tpu_restir.scene.scene import build_scene
    specs = [MaterialSpec("g", MatType.LAMBERT, diffuse=(0.5, 0.5, 0.5)),
             MaterialSpec("l", MatType.LAMBERT, diffuse=(0.7,) * 3,
                          emission=(10.0,) * 3)]
    scene = build_scene(_np.asarray(scene.tri_v),
                        _np.asarray(scene.tri_mat), specs,
                        cluster_size=128)
    assert scene.cluster_woop is not None
    rng = np.random.default_rng(41)
    o, d, tn, tf = _rays(rng, 640, 4.0)
    cfg_mxu = IntersectorConfig(backend="ptrace", ptrace_mxu=True)
    hb = intersect.intersect_closest(scene, o, d, tn, tf, _BRUTE)
    hm = intersect.intersect_closest(scene, o, d, tn, tf, cfg_mxu)
    np.testing.assert_array_equal(np.asarray(hm.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hm.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-4, atol=1e-5)
    ob = intersect.intersect_any(scene, o, d, tn, tf * 0.5, _BRUTE)
    om = intersect.intersect_any(scene, o, d, tn, tf * 0.5, cfg_mxu)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(ob))
