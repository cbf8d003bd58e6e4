"""ReSTIR frame pipeline: the pass schedule with explicit state threading.

Reference: produceRestir (pg/simpleguidx11.cpp:359-487). Where the
reference owns reservoir ping-pong buffers and last-frame copies as
static globals (pg/simpleguidx11.h:49-66), here the whole inter-frame
state is a RestirState pytree returned from each step — the functional
ping-pong. Pass order: G-buffer fill -> initial candidates ->
[visibility] -> [temporal] -> [spatial x N] -> shade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu_restir import rng
from tpu_restir.render.integrators.restir import gbuffer as gb_mod
from tpu_restir.render.integrators.restir import reservoir as rsv
from tpu_restir.render.integrators.restir.initial import (initial_pass,
                                                          visibility_pass)
from tpu_restir.render.integrators.restir.shade import shade_pass
from tpu_restir.render.integrators.restir.spatial import spatial_pass
from tpu_restir.render.integrators.restir.temporal import temporal_pass


class RestirState(struct.PyTreeNode):
    """Inter-frame state: last frame's final reservoirs + G-buffer
    (the reference's reservoirsLastFrame / gBufferLastFrame,
    pg/simpleguidx11.cpp:478-481)."""

    res_prev: rsv.Reservoir
    gb_prev: gb_mod.GBuffer


def init_restir_state(h: int, w: int) -> RestirState:
    return RestirState(res_prev=rsv.empty_reservoir((h, w)),
                       gb_prev=gb_mod.empty_gbuffer(h, w))


def restir_step(scene, cam, cfg, key, state: RestirState, frame_ctr):
    """One ReSTIR frame. Returns (radiance image, new state)."""
    r = cfg.restir

    gb = gb_mod.gbuffer_fill(scene, cam, cfg,
                             rng.pass_key(key, rng.PASS_GBUFFER))
    res = initial_pass(key, scene, gb, cfg)

    if r.do_visibility_pass:
        res = visibility_pass(scene, gb, res, cfg)

    if r.do_temporal_reuse:
        res_t = temporal_pass(key, scene, gb, state.gb_prev, res,
                              state.res_prev, cfg)
        # no temporal reuse on the very first frame (frameCtr > 0 gate,
        # pg/simpleguidx11.cpp:408)
        res = rsv.select(jnp.broadcast_to(frame_ctr > 0, res.w_sum.shape),
                         res_t, res)

    if r.do_spatial_reuse:
        k_sp = rng.pass_key(key, rng.PASS_SPATIAL)
        for i in range(r.spatial_pass_count):
            res = spatial_pass(rng.draw_key(k_sp, i), scene, gb, res, cfg)

    frame = shade_pass(scene, gb, res, cfg)
    return frame, RestirState(res_prev=res, gb_prev=gb)


def render_restir_frames(scene, cam, cfg, seed: int, n_frames: int):
    """Convenience: run n frames from a fresh state, return the
    accumulated HDR image (used by tests/benchmarks)."""
    h, w = cfg.camera.height, cfg.camera.width
    state = init_restir_state(h, w)
    step = jax.jit(restir_step, static_argnames=("cfg",))
    acc = jnp.zeros((h, w, 3))
    for f in range(n_frames):
        frame, state = step(scene, cam, cfg, rng.frame_key(seed, f), state,
                            jnp.asarray(f))
        acc = acc + (frame - acc) / (f + 1.0)
    return acc
