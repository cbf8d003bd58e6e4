import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.render import sampling


def test_disk_radius_quirk():
    """The reference's sampleDiskUniform(R) draws r = sqrt(U(0,R)), so the
    max radius is sqrt(R) — replicated on purpose (SURVEY.md §2.5)."""
    key = jax.random.key(0)
    pts = np.asarray(sampling.sample_disk_uniform(key, 30.0, (20000,)))
    r = np.linalg.norm(pts, axis=-1)
    assert r.max() <= np.sqrt(30.0) + 1e-3
    assert r.max() > np.sqrt(30.0) * 0.98


def test_triangle_barycentrics_uniform():
    key = jax.random.key(1)
    w = np.asarray(sampling.sample_triangle_barycentrics(key, (100000,)))
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (w >= 0).all()
    # uniform barycentric mean is (1/3, 1/3, 1/3)
    assert np.allclose(w.mean(0), 1 / 3, atol=5e-3)


def test_cosine_hemisphere_stats():
    key = jax.random.key(2)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (100000, 3))
    wi = np.asarray(sampling.sample_cosine_hemisphere(key, n))
    assert (wi[:, 2] >= -1e-6).all()
    # E[cos theta] = 2/3 for cosine-weighted sampling
    assert np.isclose(wi[:, 2].mean(), 2 / 3, atol=5e-3)
    # pdf formula
    pdf = np.asarray(sampling.pdf_cosine_hemisphere(n, jnp.asarray(wi)))
    assert np.allclose(pdf, np.maximum(wi[:, 2], 0) / np.pi, atol=1e-6)


def test_cosine_lobe_stats():
    key = jax.random.key(3)
    gamma = 20.0
    wr = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200000, 3))
    wi = np.asarray(sampling.sample_cosine_lobe(key, wr, gamma))
    c = wi[:, 2]
    # E[cos] for pdf ~ cos^g on sphere cap: (g+1)/(g+2)
    assert np.isclose(c.mean(), (gamma + 1) / (gamma + 2), atol=2e-3)
    # pdf integrates to 1 over the full sphere: MC with uniform dirs
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pdf = np.asarray(sampling.pdf_cosine_lobe(
        jnp.asarray(d, jnp.float32), jnp.array([0.0, 0.0, 1.0]), gamma))
    integral = pdf.mean() * 4 * np.pi
    assert np.isclose(integral, 1.0, rtol=0.05)


def test_pixel_samplers():
    key = jax.random.key(4)
    z = np.asarray(sampling.pixel_offsets(key, (8, 8), "center"))
    assert (z == 0).all()
    r = np.asarray(sampling.pixel_offsets(key, (1000,), "random"))
    assert (r >= 0).all() and (r < 1).all()
    s = np.asarray(sampling.pixel_offsets(key, (1000,), "stratified", (5, 5)))
    assert (s >= 0).all() and (s < 1).all()


def test_disk_int_offsets_match_reference_distribution():
    """The integer-exact neighbor-offset draw (compare-sum over the
    static cell table) must reproduce the distribution of the
    reference's trunc(float disk sample) (pg/ReSTIRIntegrator.cpp:
    334-341 + glm ivec2 truncation) and stay inside the disk bound the
    backward scatter relies on (dy^2+dx^2 <= radius)."""
    import jax.numpy as jnp

    radius = 30.0
    rng = np.random.default_rng(11)
    n = 200_000
    u = jnp.asarray(rng.random(n, dtype=np.float64).astype(np.float32))
    off = np.asarray(sampling.disk_int_from_uniform(u, radius))
    assert off.shape == (n, 2)
    assert int((off[:, 0] ** 2 + off[:, 1] ** 2).max()) <= int(radius)

    # float-path Monte Carlo reference
    u2 = rng.random((n, 2))
    theta = u2[:, 0] * 2 * np.pi
    r = np.sqrt(u2[:, 1] * radius)
    ref = np.stack([np.trunc(r * np.cos(theta)),
                    np.trunc(r * np.sin(theta))], axis=1).astype(int)
    k = 6
    w = 2 * k + 1

    def hist(a):
        return np.bincount((a[:, 0] + k) * w + (a[:, 1] + k),
                           minlength=w * w) / len(a)

    # per-cell probability agreement within MC noise + 1/4096 quantization
    assert np.abs(hist(off) - hist(ref)).max() < 4e-3

    # determinism: same uniforms -> bitwise same offsets on every call
    off2 = np.asarray(sampling.disk_int_from_uniform(u, radius))
    np.testing.assert_array_equal(off, off2)
