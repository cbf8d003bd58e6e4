"""Quick interpret-mode parity check: ptrace vs brute (CPU)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from tpu_restir.kernels import cluster_trace
from tpu_restir.config import IntersectorConfig
from tpu_restir.render import intersect
from tpu_restir.scene.procedural import terrain_scene, triangle_soup

cluster_trace.INTERPRET = True

_PT = IntersectorConfig(backend="ptrace")
_BRUTE = IntersectorConfig(backend="brute")


def check(scene, o, d, tn, tf, label):
    hb = intersect.intersect_closest(scene, o, d, tn, tf, _BRUTE)
    hv = intersect.intersect_closest(scene, o, d, tn, tf, _PT)
    hit_b = np.asarray(hb.hit)
    hit_v = np.asarray(hv.hit)
    np.testing.assert_array_equal(hit_v, hit_b)
    m = hit_b
    diff = m & (np.asarray(hv.tri) != np.asarray(hb.tri))
    np.testing.assert_allclose(np.asarray(hv.t)[m], np.asarray(hb.t)[m],
                               rtol=1e-6)
    ob = intersect.intersect_any(scene, o, d, tn, tf * 0.5, _BRUTE)
    ov = intersect.intersect_any(scene, o, d, tn, tf * 0.5, _PT)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ob))
    print(f"{label}: ok hits={m.sum()}/{m.size} tie-diffs={diff.sum()}")


def main():
    rng = np.random.default_rng(7)
    scene = triangle_soup(1500)
    n = 700  # deliberately not a multiple of 256 (padding path)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    dd = rng.standard_normal((n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    d = jnp.asarray(dd)
    tn = jnp.full((n,), 1e-3, jnp.float32)
    tf = jnp.full((n,), 1e4, jnp.float32)
    check(scene, o, d, tn, tf, "soup incoherent")

    scene = terrain_scene(5000)
    o = jnp.tile(jnp.asarray([0.0, -6.0, 4.0], jnp.float32), (n, 1))
    at = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    at[:, 2] = 0.3
    dd = at - np.asarray(o)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    check(scene, o, jnp.asarray(dd), tn, tf, "terrain coherent")

    # dead rays mixed in
    tfm = tf.at[::3].set(-1.0)
    check(scene, o, jnp.asarray(dd), tn, tfm, "terrain dead-mixed")


if __name__ == "__main__":
    main()
