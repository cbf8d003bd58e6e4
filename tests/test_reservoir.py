import jax
import jax.numpy as jnp
import numpy as np

from tpu_restir.render.integrators.restir import reservoir as rsv


def _cand(val, valid=True, shape=()):
    v = jnp.full(shape + (3,), val)
    return rsv.LightSample(point=v, normal=v, l_i=v,
                           valid=jnp.full(shape, valid, bool))


def test_selection_probability_proportional_to_weight():
    """P(select candidate i) must equal w_i / sum(w) for streaming WRS
    (reference Reservoir::addSample, pg/Reservoir.h:33-47)."""
    n = 40000
    weights = [1.0, 3.0, 6.0]
    res = rsv.empty_reservoir((n,))
    key = jax.random.key(0)
    for i, wgt in enumerate(weights):
        res, _ = rsv.add_sample(
            res, jax.random.fold_in(key, i), _cand(float(i), shape=(n,)),
            jnp.full((n,), wgt), jnp.ones((n,)))
    sel = np.asarray(res.sample.point[:, 0])
    total = sum(weights)
    for i, wgt in enumerate(weights):
        frac = (sel == float(i)).mean()
        assert np.isclose(frac, wgt / total, atol=0.01), (i, frac)
    assert np.allclose(np.asarray(res.w_sum), total)
    assert np.allclose(np.asarray(res.confidence), 3.0)


def test_zero_weight_candidates_never_selected():
    n = 1000
    res = rsv.empty_reservoir((n,))
    key = jax.random.key(1)
    res, acc = rsv.add_sample(res, key, _cand(5.0, shape=(n,)),
                              jnp.zeros((n,)), jnp.ones((n,)))
    assert not bool(acc.any())
    assert not bool(res.has_sample().any())
    # confidence still accumulates (reference behavior)
    assert np.allclose(np.asarray(res.confidence), 1.0)


def test_ris_estimator_unbiased():
    """RIS identity: with candidates x ~ U(0,1), target p_hat(x) = x and
    integrand f(x) = x^2, E[f(y) * W] where W = w_sum / p_hat(y) must equal
    the integral of f: 1/3."""
    n = 200000
    m = 8
    key = jax.random.key(2)
    res = rsv.empty_reservoir((n,))
    xs_kept = jnp.zeros((n,))
    for i in range(m):
        kx, ka = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.uniform(kx, (n,))
        w = x / m  # p_hat / (pdf * M), pdf = 1
        res, acc = rsv.add_sample(res, ka, _cand(0.0, shape=(n,)), w,
                                  jnp.ones((n,)))
        xs_kept = jnp.where(acc, x, xs_kept)
    w_ucw = jnp.where(xs_kept > 0, res.w_sum / jnp.maximum(xs_kept, 1e-30),
                      0.0)
    est = np.asarray(xs_kept**2 * w_ucw)
    assert np.isclose(est.mean(), 1.0 / 3.0, atol=0.004)


def test_cap_confidence():
    res = rsv.empty_reservoir((4,))
    res = res.replace(confidence=jnp.array([1.0, 10.0, 25.0, 100.0]))
    out = rsv.cap_confidence(res, 20.0)
    assert np.allclose(np.asarray(out.confidence), [1, 10, 20, 20])


def test_select_and_gather():
    a = rsv.empty_reservoir((2, 2)).replace(w_sum=jnp.ones((2, 2)))
    b = rsv.empty_reservoir((2, 2))
    mask = jnp.array([[True, False], [False, True]])
    out = rsv.select(mask, a, b)
    assert np.allclose(np.asarray(out.w_sum), [[1, 0], [0, 1]])
    g = rsv.gather(out, jnp.array([[0]]), jnp.array([[0]]))
    assert float(g.w_sum[0, 0]) == 1.0
