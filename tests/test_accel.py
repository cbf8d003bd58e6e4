"""Acceleration structures vs brute force (SURVEY.md §7 step 4 oracle:
identical hits)."""

import jax.numpy as jnp
import numpy as np

from tpu_restir.accel.bvh import build_bvh2, build_clusters
from tpu_restir.accel.traverse import bvh_any, bvh_closest, bvh_to_device
from tpu_restir.config import IntersectorConfig
from tpu_restir.render import intersect
from tpu_restir.scene import many_lights_scene


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.array([[0.0, -3.5, 1.0]], np.float32) \
        + rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = np.abs(d[:, 1])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_backend_matches_brute():
    scene = many_lights_scene(400)  # ~900 tris -> several clusters
    assert scene.cluster_min is not None
    o, d = _rays(600)
    a = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf,
                                    IntersectorConfig(backend="brute"))
    b = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf,
                                    IntersectorConfig(backend="cluster"))
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=2e-4,
                               atol=2e-4)


def test_cluster_any_matches_brute():
    scene = many_lights_scene(400)
    o, d = _rays(400, seed=2)
    tfar = jnp.full((400,), 3.0)
    a = intersect.intersect_any(scene, o, d, 0.01, tfar,
                                IntersectorConfig(backend="brute"))
    b = intersect.intersect_any(scene, o, d, 0.01, tfar,
                                IntersectorConfig(backend="cluster"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bvh2_build_invariants():
    scene = many_lights_scene(200)
    v = np.asarray(scene.tri_v)
    bvh = build_bvh2(v, leaf_size=4)
    # every primitive appears exactly once across leaves
    leaf = bvh.left < 0
    covered = []
    for i in np.nonzero(leaf)[0]:
        covered.extend(bvh.order[bvh.start[i]:bvh.start[i] + bvh.count[i]])
    assert sorted(covered) == list(range(v.shape[0]))
    # child AABBs inside parent AABBs
    for i in np.nonzero(~leaf)[0]:
        for ch in (bvh.left[i], bvh.right[i]):
            assert (bvh.node_min[ch] >= bvh.node_min[i] - 1e-5).all()
            assert (bvh.node_max[ch] <= bvh.node_max[i] + 1e-5).all()


def test_bvh_traversal_matches_brute():
    scene = many_lights_scene(200)
    v = np.asarray(scene.tri_v)
    bvh = bvh_to_device(build_bvh2(v, leaf_size=4))
    o, d = _rays(300, seed=4)
    tn = jnp.full((300,), 0.001)
    tf = jnp.full((300,), jnp.inf)
    bt, bu, bv, btri = bvh_closest(bvh, scene.tri_v0, scene.tri_e1,
                                   scene.tri_e2, o, d, tn, tf)
    ref = intersect.intersect_closest(scene, o, d, 0.001, jnp.inf,
                                      IntersectorConfig(backend="brute"))
    np.testing.assert_array_equal(np.asarray(btri >= 0), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(btri), np.asarray(ref.tri))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(bt)[hit], np.asarray(ref.t)[hit],
                               rtol=1e-5)
    occ = bvh_any(bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, tn,
                  jnp.full((300,), 3.0))
    ref_occ = intersect.intersect_any(scene, o, d, 0.001,
                                      jnp.full((300,), 3.0),
                                      IntersectorConfig(backend="brute"))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
