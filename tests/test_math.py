import jax.numpy as jnp
import numpy as np
import pytest

from tpu_restir import mathx
from tpu_restir.mathx.color import aces, srgb_compress, srgb_expand
from tpu_restir.mathx.special import calc_i_m, ibeta_nonnorm


def test_onb_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    o1, o2 = mathx.onb(jnp.asarray(n))
    o1, o2 = np.asarray(o1), np.asarray(o2)
    assert np.allclose((o1 * o2).sum(-1), 0, atol=1e-5)
    assert np.allclose((o1 * n).sum(-1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(o1, axis=-1), 1, atol=1e-5)
    assert np.allclose(np.linalg.norm(o2, axis=-1), 1, atol=1e-5)


def test_reflect_refract():
    n = jnp.array([0.0, 0.0, 1.0])
    i = mathx.normalize(jnp.array([1.0, 0.0, -1.0]))
    r = mathx.reflect(i, n)
    assert np.allclose(np.asarray(r), [1 / np.sqrt(2), 0, 1 / np.sqrt(2)],
                       atol=1e-6)
    # refraction straight through at eta=1
    t = mathx.refract(i, n, 1.0)
    assert np.allclose(np.asarray(t), np.asarray(i), atol=1e-6)
    # total internal reflection -> zero vector
    i2 = mathx.normalize(jnp.array([1.0, 0.0, -0.05]))
    t2 = mathx.refract(i2, n, 1.5)
    assert np.allclose(np.asarray(t2), 0.0)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 32)
    y = srgb_expand(srgb_compress(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_aces_range():
    x = jnp.array([0.0, 0.18, 1.0, 10.0, 1000.0])
    y = np.asarray(aces(x))
    assert (y >= 0).all() and (y <= 1).all()
    assert y[1] > 0.18 * 0.9  # midgray roughly preserved


def test_ibeta_against_scipy():
    scipy_special = pytest.importorskip("scipy.special")
    xs = np.linspace(0.01, 0.99, 17)
    for a, b in [(0.5, 0.5), (2.0, 0.5), (10.0, 0.5), (50.0, 0.5)]:
        ref = scipy_special.betainc(a, b, xs) * scipy_special.beta(a, b)
        got = np.asarray(ibeta_nonnorm(jnp.asarray(xs, jnp.float32), a, b))
        assert np.allclose(got, ref, rtol=2e-3, atol=1e-6), (a, b)


def test_calc_i_m_white_furnace():
    """I_M is the energy-normalization integral of the clipped Phong lobe
    INCLUDING the projection cosine (Mallett-Yuksel normalize
    f_r cos(theta)): I_M = integral over the upper hemisphere of
    max(0, wi.wr)^n * (wi.n). Sanity anchor: at normal incidence this is
    2*pi/(n+2). Check by Monte Carlo."""
    rng = np.random.default_rng(1)
    n_dir = np.array([0.0, 0.0, 1.0], np.float32)
    for shin in [1.0, 8.0, 64.0]:
        for cos_v in [1.0, 0.7, 0.3]:
            sin_v = np.sqrt(1 - cos_v**2)
            v = np.array([sin_v, 0.0, cos_v], np.float32)  # view dir
            wr = 2 * np.dot(v, n_dir) * n_dir - v  # mirror of v around n
            m = 400000
            xyz = rng.normal(size=(m, 3))
            xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
            xyz[:, 2] = np.abs(xyz[:, 2])
            lobe = np.maximum(xyz @ wr, 0.0) ** shin * xyz[:, 2]
            integral = lobe.mean() * 2 * np.pi
            i_m = float(calc_i_m(jnp.float32(cos_v), jnp.float32(shin)))
            assert np.isclose(integral, i_m, rtol=0.05), \
                (shin, cos_v, integral, i_m)
    assert np.isclose(float(calc_i_m(jnp.float32(1.0), jnp.float32(1.0))),
                      2 * np.pi / 3, rtol=1e-4)


def test_power_heuristic():
    assert float(mathx.power_heuristic(jnp.float32(1.0), jnp.float32(0.0))) == 1.0
    assert float(mathx.power_heuristic(jnp.float32(0.0), jnp.float32(0.0))) == 0.0
    w = float(mathx.power_heuristic(jnp.float32(1.0), jnp.float32(1.0)))
    assert np.isclose(w, 0.5)


def test_sanitize():
    x = jnp.array([[1.0, -2.0, jnp.nan]])
    out = np.asarray(mathx.sanitize(x))
    assert np.allclose(out, [[1.0, 0.0, 0.0]])
