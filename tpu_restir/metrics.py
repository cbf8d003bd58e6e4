"""Image statistics and per-pass timing.

Mean/variance of the accumulator exactly as the reference computes them
for its unbiasedness/variance methodology (pg/simpleguidx11.cpp:308-329):
per-pixel channel mean, then E[X] and D(X)=E[X^2]-E[X]^2 over pixels.
These are the comparison currency of BASELINE.md.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict

import jax
import jax.numpy as jnp


def image_mean_variance(img: jnp.ndarray):
    pix = jnp.mean(img, axis=-1)
    mean = jnp.mean(pix)
    var = jnp.mean(pix * pix) - mean * mean
    return mean, var


class PassTimers:
    """Wall-clock per-pass timers (reference pg/simpleguidx11.h:120-127),
    measured around blocking device sync."""

    def __init__(self):
        self.durations: Dict[str, float] = {}

    @contextmanager
    def measure(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.durations[name] = self.durations.get(name, 0.0) \
            + (time.perf_counter() - t0)

    def total(self) -> float:
        return sum(self.durations.values())
