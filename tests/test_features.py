"""Config files, per-pass timers, debug views, viewer helpers."""

import os

import jax.numpy as jnp
import numpy as np

from tpu_restir.config import (CameraConfig, RenderConfig, RenderParams,
                               RestirParams, load_config_file)
from tpu_restir.renderer import Renderer
from tpu_restir.scene import cornell_box

_TOML = """
integrator = "restir"
seed = 7

[camera]
width = 32
height = 24
fov_y_deg = 50.0
view_from = [0.0, -3.9, 1.0]
pixel_sampler = "random"

[params]
use_skybox = false
max_bounce_count = 3

[restir]
m_area = 2
do_temporal_reuse = true
spatial_mis = "pairwise"
"""


def _base_cfg(w=24, h=24, **restir_kw):
    return RenderConfig(
        camera=CameraConfig(width=w, height=h, fov_y_deg=45.0,
                            view_from=(0.0, -3.9, 1.0),
                            view_at=(0.0, 0.0, 1.0),
                            pixel_sampler="random"),
        params=RenderParams(use_skybox=False),
        restir=RestirParams(m_area=1, m_brdf=1, **restir_kw),
        integrator="restir")


def test_load_toml_config(tmp_path):
    p = tmp_path / "render.toml"
    p.write_text(_TOML)
    cfg = load_config_file(str(p))
    assert cfg.camera.width == 32 and cfg.camera.height == 24
    assert cfg.camera.view_from == (0.0, -3.9, 1.0)
    assert cfg.params.max_bounce_count == 3
    assert cfg.restir.m_area == 2 and cfg.restir.do_temporal_reuse
    assert cfg.seed == 7


def test_load_json_config(tmp_path):
    p = tmp_path / "render.json"
    p.write_text('{"seed": 9, "camera": {"width": 16, "height": 16}}')
    cfg = load_config_file(str(p))
    assert cfg.seed == 9 and cfg.camera.width == 16


def test_cli_overrides_config_file(tmp_path):
    from tpu_restir.cli import build_parser, config_from_args

    p = tmp_path / "render.toml"
    p.write_text(_TOML)
    parser = build_parser()
    a = parser.parse_args(["--config", str(p), "--m-area", "4"])
    cfg = config_from_args(a, parser)
    assert cfg.restir.m_area == 4              # CLI override
    assert cfg.restir.do_temporal_reuse        # file value kept
    assert cfg.camera.width == 32              # file value kept


def test_profile_passes_matches_fused_step():
    """The pass-by-pass timed step must produce the same frames as the
    fused jitted step, and fill the per-pass timers."""
    scene = cornell_box()
    cfg = _base_cfg(do_temporal_reuse=True, do_spatial_reuse=True,
                    spatial_neighbor_count=3, spatial_mis="pairwise")

    r_fused = Renderer(scene, cfg)
    r_fused.run(3)
    r_timed = Renderer(scene, cfg.replace(profile_passes=True))
    r_timed.run(3)

    np.testing.assert_allclose(np.asarray(r_timed.accumulator),
                               np.asarray(r_fused.accumulator),
                               rtol=1e-5, atol=1e-6)
    ms = r_timed.timers.mean_ms()
    # prefix-difference timing: individual passes can clamp to 0 ms at
    # this tiny scale (timing noise), but every stage must be recorded
    # and the total must be positive
    for name in ("gbuffer", "initial", "temporal", "spatial", "shade"):
        assert name in ms and ms[name] >= 0.0
    assert sum(ms.values()) > 0.0


def test_pass_times_written_to_sidecar(tmp_path):
    scene = cornell_box()
    cfg = _base_cfg(do_spatial_reuse=True, spatial_neighbor_count=2)
    r = Renderer(scene, cfg.replace(profile_passes=True))
    r.run(2)
    out = str(tmp_path / "img.png")
    r.export(out)
    txt = open(out + ".txt").read()
    assert "Pass times (ms):" in txt and "spatial:" in txt
    assert os.path.exists(out)


def test_debug_reprojection_paints_reasons():
    scene = cornell_box()
    cfg = _base_cfg(do_temporal_reuse=True, debug_reprojection=True)
    r = Renderer(scene, cfg)
    r.step()
    # move the camera so reprojection rejects some pixels, then step
    r.set_camera(view_from=(0.8, -3.5, 1.3))
    frame = r.step()
    a = np.asarray(frame)
    assert np.isfinite(a).all()
    # painted debug colors use the reference's 100-valued channels
    assert (a.max(axis=-1) == 100.0).any()


def test_show_weights_renders_mis_weights():
    scene = cornell_box()
    cfg = _base_cfg().replace(
        integrator="nee", direct_strategy="mis", show_weights=True,
        nee_calc_gi=False,
        params=RenderParams(use_skybox=False, bg_color=(0.0, 0.0, 0.0)))
    r = Renderer(scene, cfg)
    frame = np.asarray(r.step())
    assert np.isfinite(frame).all()
    # DI renders as weights in R/G with zero B; only directly-seen
    # emitters (emission 17,12,4) and the black bg escape that pattern
    emitter = frame[..., 2] > 3.0
    assert frame[~emitter][..., 0].max() <= 1.0 + 1e-5
    assert frame[~emitter][..., 1].max() <= 1.0 + 1e-5
    assert np.all(frame[~emitter][..., 2] == 0.0)
    # and some weights must actually be non-trivial
    assert (frame[~emitter][..., 1] > 0.05).any()


def test_viewer_helpers():
    from tpu_restir.view import ansi_preview, orbit_camera

    img = np.random.default_rng(0).uniform(0, 1, (32, 64, 3))
    s = ansi_preview(img, max_cols=32, max_rows=8)
    assert "\x1b[38;2;" in s and s.count("\n") >= 7

    fr = orbit_camera((0.0, -3.9, 1.0), (0.0, 0.0, 1.0), 90.0)
    assert abs(fr[2] - 1.0) < 1e-9                      # z preserved
    assert abs(np.linalg.norm(np.asarray(fr) - np.asarray((0, 0, 1.0)))
               - 3.9) < 1e-6                            # radius preserved
    np.testing.assert_allclose(fr[:2], (3.9, 0.0), atol=1e-6)  # CCW 90deg


def test_run_view_smoke(tmp_path, capsys):
    import io

    from tpu_restir.view import run_view

    scene = cornell_box()
    r = Renderer(scene, _base_cfg(w=16, h=16))
    buf = io.StringIO()
    run_view(r, 2, orbit_deg_per_frame=5.0, refresh_every=1, out=buf)
    text = buf.getvalue()
    assert "frame 2/2" in text and "mean=" in text
