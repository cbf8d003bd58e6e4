"""Torrance-Sparrow (GGX) material + VNDF sampler oracles.

Reference: MaterialTS (pg/MaterialTS.cpp:7-69) and Sampling::sampleGGXVNDF
(pg/Sampling.cpp:105-134)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.render import brdf, sampling
from tpu_restir.scene.materials import (MaterialSpec, MatType,
                                        build_material_table,
                                        gather_materials)


def _ts_table(roughness, ior=1.5, diffuse=(0.4, 0.4, 0.4)):
    table = build_material_table([
        MaterialSpec("ts", MatType.TS, diffuse=diffuse, ior=ior,
                     roughness=roughness)])
    return gather_materials(table, jnp.zeros((1,), jnp.int32))


def _ref_ts(diffuse, roughness, ior, n, wo, wi):
    """NumPy port of the reference formulas (incl. unnormalized half
    vector), as the oracle."""
    wm = (wo + wi) / 2.0
    mdi = max(float(np.dot(wi, wm)), 0.0)
    mdo = max(float(np.dot(wo, wm)), 0.0)
    ndm = max(float(np.dot(wm, n)), 0.0)
    alpha = roughness * roughness
    a2 = alpha * alpha
    if alpha == 1.0:
        d = 1.0 / np.pi
    else:
        inner = (a2 - 1.0) * ndm * ndm + 1.0
        d = a2 / np.pi / (inner * inner)

    def gaux(dd):
        return (np.sqrt(1.0 + a2 * (1.0 / (dd * dd) - 1.0)) - 1.0) / 2.0

    g = 1.0 / (1.0 + gaux(mdo) + gaux(mdi))
    f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    f = f0 + (1.0 - f0) * (1.0 - mdi) ** 5
    return np.asarray(diffuse) / np.pi + 0.25 * d * f * g / (mdi * mdo)


def test_ts_eval_matches_reference_formula():
    n = np.array([0.0, 0.0, 1.0], np.float32)
    wo = np.array([0.3, -0.2, 0.9], np.float32)
    wo /= np.linalg.norm(wo)
    wi = np.array([-0.4, 0.1, 0.9], np.float32)
    wi /= np.linalg.norm(wi)
    for rough in (0.3, 1.0):
        m = _ts_table(rough)
        got = brdf.eval_bsdf(m, jnp.asarray(n)[None], -jnp.asarray(wo)[None],
                             jnp.asarray(wi)[None])
        want = _ref_ts((0.4, 0.4, 0.4), rough, 1.5, n, wo, wi)
        assert np.allclose(np.asarray(got)[0], want, rtol=1e-4), (rough,
                                                                  got, want)


def test_ts_samples_like_lambert():
    m = _ts_table(0.5)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.3, -0.95]])
    d = d / jnp.linalg.norm(d)
    s = brdf.sample_bsdf(jax.random.PRNGKey(0), m, n, d,
                         jnp.zeros((1,), bool), jnp.ones((1,)))
    # upward cosine-distributed direction, lambert pdf
    assert float(s.omega_i[0, 2]) > 0.0
    pdf_cos = sampling.pdf_cosine_hemisphere(n, s.omega_i)
    assert np.allclose(np.asarray(s.pdf), np.asarray(pdf_cos), rtol=1e-5)
    # f_r is the full TS eval at the sampled direction
    want = brdf.eval_bsdf(m, n, d, s.omega_i)
    assert np.allclose(np.asarray(s.f_r), np.asarray(want), rtol=1e-5)


def test_vndf_sampler_properties():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (4096, 2))
    ve = jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, 0.95]) / np.linalg.norm([0.3, 0.1, 0.95]),
        (4096, 3))
    ne, pdf = sampling.ggx_vndf_from_uniforms(u, ve, 0.3, 1.0, 1.0)
    ne_np = np.asarray(ne)
    # unit normals in the upper hemisphere, visible from ve
    assert np.allclose(np.linalg.norm(ne_np, axis=-1), 1.0, atol=1e-4)
    assert (ne_np[:, 2] >= 0.0).all()
    assert (np.asarray(jnp.sum(ne * ve, axis=-1)) > 0.0).mean() > 0.99
    assert np.isfinite(np.asarray(pdf)).all()
