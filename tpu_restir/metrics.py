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
    measured around blocking device sync:

        with timers.measure("spatial") as done:
            out = spatial(...)
            done(out)   # block_until_ready(out) before stopping the clock
    """

    def __init__(self):
        self.durations: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def measure(self, name: str):
        holder = []
        t0 = time.perf_counter()
        yield holder.append
        if holder:
            jax.block_until_ready(holder[-1])
        self.durations[name] = self.durations.get(name, 0.0) \
            + (time.perf_counter() - t0)
        self.counts[name] = self.counts.get(name, 0) + 1

    def record(self, name: str, seconds: float) -> None:
        """Record an externally measured duration (prefix profiling)."""
        self.durations[name] = self.durations.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean_ms(self) -> Dict[str, float]:
        """Average per-invocation milliseconds per pass."""
        return {k: 1e3 * v / max(self.counts.get(k, 1), 1)
                for k, v in self.durations.items()}

    def total(self) -> float:
        return sum(self.durations.values())
