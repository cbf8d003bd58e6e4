"""Special functions for the Phong energy normalization.

The reference normalizes its cosine-lobe specular term with Mallett &
Yuksel's I_M integral, computed via boost::math::beta (the NON-normalized
incomplete beta B_x(a,b)) and lgamma (reference pg/MaterialPhong.cpp:224-248).
Here the same quantities are built from jax.scipy.special primitives so the
whole shading path stays jittable and differentiable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammaln

# plain floats: a jnp op here would initialize the JAX backend at import
# time, locking the platform before callers (e.g. the multi-chip dry run)
# can configure it
_TWO_PI = 2.0 * math.pi
_ROOT_PI = math.sqrt(math.pi)


def ibeta_nonnorm(x, a, b):
    """Non-normalized incomplete beta B_x(a, b) = I_x(a,b) * B(a,b).

    Equivalent of boost::math::beta(a, b, x) used at
    pg/MaterialPhong.cpp:246-248. a, b > 0; x in [0, 1].
    """
    # detach the shape parameters: jax.scipy betainc has no a/b gradient,
    # and the normalization's derivative w.r.t. shininess is dropped by
    # design (detached-estimator convention — only the x path, which is
    # geometry-independent here, would carry it anyway)
    a = jax.lax.stop_gradient(jnp.asarray(a, jnp.float32))
    b = jax.lax.stop_gradient(jnp.asarray(b, jnp.float32))
    x = jnp.clip(x, 0.0, 1.0)
    a_safe = jnp.maximum(a, 1e-12)
    log_beta = gammaln(a_safe) + gammaln(b) - gammaln(a_safe + b)
    return betainc(a_safe, b, x) * jnp.exp(log_beta)


def gamma_quot(a, b):
    """Gamma(a) / Gamma(b) via lgamma (reference MaterialPhong::gamma_quot)."""
    return jnp.exp(gammaln(a) - gammaln(b))


def calc_i_m(n_dot_v, n):
    """Mallett-Yuksel I_M normalization integral for a cosine-lobe of
    exponent n viewed at cos(theta)=n_dot_v.

    Faithful port of the math at pg/MaterialPhong.cpp:228-244:
      I_M = (2*pi*c + sqrt(pi) * G(n/2+1/2)/G(n/2+1) * (s^(n/2) - negterm))
            / (n + 2)
    where s = clamp(1-c^2, 0, 1) and
    negterm = c * (n/2) * B_s(n/2, 1/2) when n >= 1e-18, else c.
    """
    n = jnp.asarray(n, jnp.float32)
    cost = jnp.asarray(n_dot_v, jnp.float32)
    sin2 = jnp.clip(1.0 - cost * cost, 0.0, 1.0)
    halfn = 0.5 * n

    big_n = n >= 1e-18
    negterm = jnp.where(
        big_n, cost * halfn * ibeta_nonnorm(sin2, halfn, 0.5), cost)

    gq = gamma_quot(halfn + 0.5, halfn + 1.0)
    # s^(n/2) via the AD-safe power (guards 0^0 -> 1 like std::pow AND
    # the 0 * ln(0) shininess-gradient NaN)
    from tpu_restir import mathx

    pow_term = mathx.safe_pow(jnp.maximum(sin2, 0.0), halfn)

    return (_TWO_PI * cost + _ROOT_PI * gq * (pow_term - negterm)) / (n + 2.0)
