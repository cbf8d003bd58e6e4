"""Display-path features: denoise wiring and the debug-pixel overlay
(reference display pipeline, pg/simpleguidx11.cpp:246-295)."""

import numpy as np

from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams)
from tpu_restir.renderer import Renderer
from tpu_restir.scene import cornell_box


def _cfg(**params):
    return RenderConfig(
        camera=CameraConfig(width=16, height=16, fov_y_deg=45.0,
                            view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False, **params),
        restir=RestirParams(m_area=1, m_brdf=1, do_temporal_reuse=False,
                            do_spatial_reuse=False),
        integrator="restir")


def test_debug_pixel_paints_magenta():
    r = Renderer(cornell_box(), _cfg(debug_pixel=(3, 5)))
    r.run(1)
    img = r.display()
    assert np.allclose(img[5, 3], [1.0, 0.0, 1.0])


def test_denoise_changes_display_without_nans():
    import dataclasses

    r = Renderer(cornell_box(), _cfg())
    r.run(2)
    raw = r.display()
    r.cfg = dataclasses.replace(
        r.cfg, params=dataclasses.replace(r.cfg.params, denoise=True))
    den = r.display()
    assert np.isfinite(den).all()
    assert not np.allclose(raw, den)   # the filter does something
    # denoising preserves overall brightness roughly
    assert abs(den.mean() - raw.mean()) / max(raw.mean(), 1e-6) < 0.25


def test_live_parameter_editing_keys():
    """Viewer key map (the reference's ImGui panel analog) edits the
    config purely, and Renderer.update_config swaps the pipeline variant
    mid-run without disturbing resolution or state shapes."""
    import jax.numpy as jnp

    from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                                   RestirParams)
    from tpu_restir.renderer import Renderer
    from tpu_restir.scene import cornell_box
    from tpu_restir.view import apply_key

    cfg = RenderConfig(
        camera=CameraConfig(width=32, height=32, fov_y_deg=45.0,
                            view_from=(0, -3.9, 1.0), view_at=(0, 0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1), integrator="restir")

    c2 = apply_key(cfg, "t")
    assert c2.restir.do_temporal_reuse and not cfg.restir.do_temporal_reuse
    c3 = apply_key(apply_key(cfg, "M"), "M")
    assert c3.restir.m_area == 3  # 1 -> 2 -> 3: edits compose
    assert apply_key(cfg, "m").restir.m_area == 0
    assert apply_key(cfg, "p").restir.spatial_mis != cfg.restir.spatial_mis
    assert apply_key(cfg, "x") is None

    r = Renderer(cornell_box(), cfg)
    r.step()
    r.update_config(apply_key(cfg, "s"))   # spatial reuse ON mid-run
    r.step()
    assert r.acc_ctr == 2
    assert bool(jnp.isfinite(r.accumulator).all())
    import pytest

    with pytest.raises(ValueError):
        r.update_config(cfg.replace(camera=cfg.camera.__class__(
            width=64, height=64)))
