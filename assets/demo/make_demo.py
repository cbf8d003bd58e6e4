"""Generate the bundled demo asset (assets/demo/).

The reference's own demo scenes (room.obj, forest.hdr) are stripped from
its mirror (SURVEY.md §0), so the framework ships this generated
equivalent: a room with SIX objects — one per Pc material-type code the
reference's ModelLoader understands (pg/ModelLoader.cpp:52-72: 0=Normal,
1=Lambert, 2=Phong, 3=Mirror, 4=Dielectric, 5=Transparent) — a textured
floor (diffuse checker + specular map + tangent-space normal map), an
emissive ceiling panel, and an equirect HDR environment (PFM).

Run from the repo root to (re)generate the committed files:
    python assets/demo/make_demo.py
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _checker(n=64, a=(0.85, 0.55, 0.25), b=(0.2, 0.25, 0.55), tiles=8):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    c = ((yy * tiles // n + xx * tiles // n) % 2).astype(np.float32)
    img = np.where(c[..., None] > 0, np.asarray(a), np.asarray(b))
    return (img * 255).astype(np.uint8)


def _specmap(n=64):
    yy, xx = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    v = 0.25 + 0.7 * (0.5 + 0.5 * np.sin(xx * 12.6) * np.cos(yy * 12.6))
    img = np.repeat((v[..., None] * 255).astype(np.uint8), 3, -1)
    return img


def _normalmap(n=64, bumps=6, strength=0.6):
    yy, xx = np.meshgrid(np.linspace(0, 2 * np.pi * bumps, n),
                         np.linspace(0, 2 * np.pi * bumps, n), indexing="ij")
    dz_dx = strength * np.cos(xx) * np.sin(yy)
    dz_dy = strength * np.sin(xx) * np.cos(yy)
    n_vec = np.stack([-dz_dx, -dz_dy, np.ones_like(dz_dx)], -1)
    n_vec /= np.linalg.norm(n_vec, axis=-1, keepdims=True)
    return ((n_vec * 0.5 + 0.5) * 255).astype(np.uint8)


def _env(h=32, w=64):
    """Soft sky gradient + warm sun disc, HDR range."""
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    sky = np.stack([0.25 + 0.3 * yy + 0 * xx,
                    0.4 + 0.35 * yy + 0 * xx,
                    0.7 + 0.3 * yy + 0 * xx], -1)
    sun = 40.0 * np.exp(-(((xx - 0.25) * 10) ** 2
                          + ((yy - 0.8) * 10) ** 2))
    sky[..., 0] += sun
    sky[..., 1] += 0.9 * sun
    sky[..., 2] += 0.7 * sun
    return sky.astype(np.float32)


def _cube(cx, cy, cz, s):
    """Axis-aligned cube as 12 triangles with per-face UVs; returns
    (v, vt, faces) index lists appended by the caller."""
    x0, x1 = cx - s, cx + s
    y0, y1 = cy - s, cy + s
    z0, z1 = cz - s, cz + s
    verts = [(x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
             (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)]
    quads = [(0, 1, 5, 4), (2, 3, 7, 6), (1, 2, 6, 5),
             (3, 0, 4, 7), (4, 5, 6, 7), (3, 2, 1, 0)]
    return verts, quads


def main():
    try:
        from PIL import Image

        Image.fromarray(_checker()).save(os.path.join(HERE, "checker.png"))
        Image.fromarray(_specmap()).save(os.path.join(HERE, "spec.png"))
        Image.fromarray(_normalmap()).save(os.path.join(HERE, "normal.png"))
    except ImportError:  # pragma: no cover
        print("PIL missing; skipping textures")

    import sys

    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from tpu_restir.scene.envmap import write_pfm

    write_pfm(os.path.join(HERE, "env.pfm"), _env())

    mtl = """# Demo materials — Pc selects the material class like the
# reference's clearcoat-as-type hack (pg/ModelLoader.cpp:52-72)
newmtl floor
Pc 1
Kd 0.8 0.8 0.8
map_Kd checker.png
map_bump normal.png

newmtl wall
Pc 1
Kd 0.62 0.58 0.55

newmtl obj_normal
Pc 0
Kd 0.6 0.6 0.6

newmtl obj_lambert
Pc 1
Kd 0.2 0.55 0.25
map_Kd checker.png

newmtl obj_phong
Pc 2
Kd 0.35 0.12 0.1
Ks 0.6 0.6 0.6
Ns 80
map_Ks spec.png

newmtl obj_mirror
Pc 3
Ks 0.92 0.92 0.95

newmtl obj_dielectric
Pc 4
Kd 0.1 0.1 0.4
Ks 0.2 0.2 0.2
Ns 200
Ni 1.5

newmtl obj_transparent
Pc 5
Ni 1.5
Tf 0.12 0.04 0.04

newmtl light
Pc 1
Kd 0.78 0.78 0.78
Ke 22 20 17
"""
    with open(os.path.join(HERE, "demo.mtl"), "w") as f:
        f.write(mtl)

    lines = ["mtllib demo.mtl"]
    v_off = [0]
    vt_off = [0]

    def emit_quad(mat, quad_verts, uv_scale=1.0):
        base = v_off[0]
        for p in quad_verts:
            lines.append(f"v {p[0]} {p[1]} {p[2]}")
        for u, vv in ((0, 0), (uv_scale, 0), (uv_scale, uv_scale),
                      (0, uv_scale)):
            lines.append(f"vt {u} {vv}")
        tb = vt_off[0]
        lines.append(f"usemtl {mat}")
        lines.append(f"f {base+1}/{tb+1} {base+2}/{tb+2} {base+3}/{tb+3} "
                     f"{base+4}/{tb+4}")
        v_off[0] += 4
        vt_off[0] += 4

    def emit_cube(mat, cx, cy, cz, s):
        verts, quads = _cube(cx, cy, cz, s)
        base = v_off[0]
        for p in verts:
            lines.append(f"v {p[0]} {p[1]} {p[2]}")
        tb = vt_off[0]
        for u, vv in ((0, 0), (1, 0), (1, 1), (0, 1)):
            lines.append(f"vt {u} {vv}")
        lines.append(f"usemtl {mat}")
        for q in quads:
            lines.append(
                "f " + " ".join(f"{base+q[k]+1}/{tb+[1,2,3,4][k]}"
                                for k in range(4)))
        v_off[0] += 8
        vt_off[0] += 4

    # floor (tiled checker), back wall
    emit_quad("floor", [(-4, -4, 0), (4, -4, 0), (4, 4, 0), (-4, 4, 0)],
              uv_scale=4.0)
    emit_quad("wall", [(-4, 3.0, 0), (4, 3.0, 0), (4, 3.0, 3.2),
                       (-4, 3.0, 3.2)])
    # six material showcase cubes
    mats = ["obj_normal", "obj_lambert", "obj_phong", "obj_mirror",
            "obj_dielectric", "obj_transparent"]
    for i, m in enumerate(mats):
        x = -3.1 + 1.25 * i
        emit_cube(m, x, 0.4, 0.45, 0.42)
    # emissive ceiling panel (area light)
    emit_quad("light", [(-1.2, -0.4, 3.0), (1.2, -0.4, 3.0),
                        (1.2, 1.2, 3.0), (-1.2, 1.2, 3.0)])

    with open(os.path.join(HERE, "demo.obj"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote demo.obj/.mtl + textures + env.pfm in", HERE)


if __name__ == "__main__":
    main()
