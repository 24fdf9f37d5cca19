#!/usr/bin/env python
"""Render solver OBJ outputs to PNG.

Counterpart of the reference's Blender-based renderer
(``render/mesh_visual.py``, ``render/render.sh``); this environment has
no Blender, so meshes are rasterized with matplotlib's 3D toolkit —
sufficient for inspecting deformation results and making report figures.

Usage:
    python scripts/mesh_visual.py out.obj [more.obj ...] [--out fig.png]
"""

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from mpl_toolkits.mplot3d import art3d  # noqa: E402


def load_obj(path):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in t[1:4]])
    return np.asarray(verts), np.asarray(faces, int)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("objs", nargs="+")
    p.add_argument("--out", default=None)
    p.add_argument("--elev", type=float, default=20)
    p.add_argument("--azim", type=float, default=-60)
    args = p.parse_args()

    n = len(args.objs)
    fig = plt.figure(figsize=(6 * n, 6))
    for i, path in enumerate(args.objs):
        verts, faces = load_obj(path)
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        if len(faces):
            poly = art3d.Poly3DCollection(
                verts[faces], alpha=0.9, linewidths=0.2
            )
            poly.set_facecolor("#8ab6d6")
            poly.set_edgecolor("#2a4d69")
            ax.add_collection3d(poly)
        lo, hi = verts.min(0), verts.max(0)
        c = (lo + hi) / 2
        r = (hi - lo).max() / 2
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
        ax.view_init(elev=args.elev, azim=args.azim)
        ax.set_title(path.rsplit("/", 1)[-1])
    out = args.out or (args.objs[0] + ".png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
