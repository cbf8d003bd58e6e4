"""Differentiable scene parameters.

The whole pipeline is pure array math, so pixel-loss gradients flow to
any scene quantity by construction. This module defines the optimizable
parameter pytree (material albedo/specular/shininess/emission — the
quantities BASELINE.json's config 4 optimizes) and its injection into
SceneArrays.

Resampling note: reservoir acceptance decisions are boolean selects whose
gradients are zero almost everywhere, so autodiff through ReSTIR is
exactly the detached-resampling estimator — selection treated as
constant, gradients flowing through shading f and the contribution
weights. With common random numbers (fixed frame seeds) this matches
finite differences of the same estimator (tests/test_diff.py).

Caveat: emission gradients are valid only while the emissive SET is
unchanged — the light CDF (areas) is built at scene-build time and does
not depend on emission magnitude (pg/TriangleCDF.cpp semantics).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

DEFAULT_FIELDS = ("diffuse", "specular", "shininess", "emission")

# full BASELINE config-4 set: + GGX roughness (MaterialTS) and the raw
# texture texels (albedo/specular/roughness maps live in one stack)
ALL_FIELDS = DEFAULT_FIELDS + ("roughness", "tex_data")


def extract_params(scene, fields: Sequence[str] = DEFAULT_FIELDS) -> Dict:
    out = {}
    for f in fields:
        if f == "tex_data":
            if scene.textures is None:
                raise ValueError("scene has no texture stack to optimize")
            out[f] = scene.textures.data
        else:
            out[f] = getattr(scene.materials, f)
    return out


def apply_params(scene, params: Dict):
    """Return a scene with material columns / texture texels replaced by
    `params` leaves (clipped into physical range)."""
    upd = {}
    for name, val in params.items():
        if name == "tex_data":
            scene = scene.replace(textures=scene.textures.replace(
                data=jnp.maximum(val, 0.0)))
            continue
        if name in ("diffuse", "specular"):
            val = jnp.clip(val, 0.0, 1.0)
        elif name == "shininess":
            val = jnp.maximum(val, 0.0)
        elif name == "roughness":
            # GGX alpha = r^2; keep strictly positive so D stays finite
            val = jnp.clip(val, 1e-3, 4.0)
        elif name == "emission":
            val = jnp.maximum(val, 0.0)
        upd[name] = val
    if upd:
        scene = scene.replace(materials=scene.materials.replace(**upd))
    return scene
