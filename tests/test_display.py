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
