"""Minimal live viewer: in-terminal progressive display + camera orbit.

The reference is an interactive ImGui/D3D11 app with a stats panel and
mouse-orbit camera (pg/simpleguidx11.cpp:497-604). Headless equivalent:
every frame the display image renders into the terminal as 24-bit ANSI
half-block cells (two pixels per character row), with a stats line
(iteration, mean/variance, per-pass ms when profiling); --orbit spins the
camera around the view target like the reference's right-drag orbit
(pg/simpleguidx11.cpp:572-604), exercising temporal reprojection under
real motion. PNG refresh (--export-every) covers non-TTY use.
"""

from __future__ import annotations

import math
import sys

import numpy as np


def ansi_preview(img: np.ndarray, max_cols: int = 96,
                 max_rows: int = 48) -> str:
    """(H, W, 3) floats in [0,1] -> ANSI string, 2 pixels per char row."""
    h, w = img.shape[:2]
    step = max(1, math.ceil(w / max_cols), math.ceil(h / (2 * max_rows)))
    # box-filter downsample by `step`
    hh = (h // step) * step
    ww = (w // step) * step
    small = img[:hh, :ww].reshape(hh // step, step, ww // step, step, 3)
    small = small.mean(axis=(1, 3))
    if small.shape[0] % 2:
        small = small[:-1]
    byte = (np.clip(small, 0.0, 1.0) * 255).astype(np.uint8)
    top = byte[0::2]
    bot = byte[1::2]
    lines = []
    for r in range(top.shape[0]):
        cells = []
        for c in range(top.shape[1]):
            tr, tg, tb = top[r, c]
            br, bg, bb = bot[r, c]
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                         f"\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def orbit_camera(view_from, view_at, angle_deg: float):
    """Rotate the eye around the target about +z (the reference's
    spherical orbit, pg/simpleguidx11.cpp:572-604)."""
    f = np.asarray(view_from, np.float64)
    at = np.asarray(view_at, np.float64)
    rel = f - at
    a = math.radians(angle_deg)
    c, s = math.cos(a), math.sin(a)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return tuple((at + rot @ rel).tolist())


def run_view(renderer, n_frames: int, orbit_deg_per_frame: float = 0.0,
             refresh_every: int = 1, out=sys.stdout):
    """Progressive render with live terminal display."""
    is_tty = hasattr(out, "isatty") and out.isatty()
    view_from = renderer.cfg.camera.view_from
    view_at = renderer.cfg.camera.view_at
    for i in range(n_frames):
        # accumulation deliberately NOT reset on camera motion — matches
        # the reference (reset is explicit, pg/simpleguidx11.cpp:303-306)
        if orbit_deg_per_frame:
            view_from = orbit_camera(view_from, view_at,
                                     orbit_deg_per_frame)
            renderer.set_camera(view_from=view_from)
        renderer.step()
        if (i + 1) % refresh_every == 0 or i + 1 == n_frames:
            img = renderer.display()
            mean, var = renderer.stats()
            if is_tty:
                out.write("\x1b[H\x1b[2J")   # clear
                out.write(ansi_preview(img) + "\n")
            line = (f"frame {i + 1}/{n_frames}  acc={renderer.acc_ctr}  "
                    f"mean={mean:.5g} var={var:.5g}  "
                    f"t={renderer.render_time:.1f}s")
            ms = renderer.timers.mean_ms()
            if ms:
                line += "  |  " + "  ".join(f"{k}={v:.1f}ms"
                                            for k, v in ms.items())
            out.write(line + "\n")
            out.flush()
    return renderer.accumulator
