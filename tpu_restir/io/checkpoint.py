"""Checkpoint / resume of progressive renders.

The reference has none (SURVEY.md §5.4); its resumable state is exactly:
accumulator image, frame counters, reservoir buffers, last-frame
G-buffer, render time, camera. All of that is an array pytree here, so
checkpointing is one np.savez and restart of long renders is cheap.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def save(renderer, path: str) -> None:
    flat = {"accumulator": np.asarray(renderer.accumulator),
            "acc_ctr": np.asarray(renderer.acc_ctr),
            "frame_ctr": np.asarray(renderer.frame_ctr),
            "render_time": np.asarray(renderer.render_time)}
    if renderer._restir_state is not None:
        leaves, treedef = jax.tree.flatten(renderer._restir_state)
        for i, leaf in enumerate(leaves):
            flat[f"restir_{i}"] = np.asarray(leaf)
        flat["restir_n"] = np.asarray(len(leaves))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def try_restore(renderer, path: str) -> bool:
    p = path if path.endswith(".npz") else path + ".npz"
    if not os.path.exists(p) and not os.path.exists(path):
        return False
    data = np.load(p if os.path.exists(p) else path)
    renderer.accumulator = jnp.asarray(data["accumulator"])
    renderer.acc_ctr = int(data["acc_ctr"])
    renderer.frame_ctr = int(data["frame_ctr"])
    renderer.render_time = float(data["render_time"])
    # resume wall-clock accounting from the saved total
    renderer._time_base = renderer.render_time
    import time

    renderer._t_reset = time.perf_counter()
    if renderer._restir_state is not None and "restir_n" in data:
        n = int(data["restir_n"])
        leaves, treedef = jax.tree.flatten(renderer._restir_state)
        new_leaves = [jnp.asarray(data[f"restir_{i}"]) for i in range(n)]
        renderer._restir_state = jax.tree.unflatten(treedef, new_leaves)
    return True
