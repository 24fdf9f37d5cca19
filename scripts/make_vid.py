#!/usr/bin/env python
"""Assemble solver OBJ snapshot sequences into an animation.

Counterpart of the reference's video maker (``render/make_vid.py``,
which stitches Blender-rendered frames with ffmpeg).  This environment
has neither Blender nor ffmpeg, so frames are rasterized with the
matplotlib proxy renderer (``scripts/mesh_visual.py``) and written as
an animated GIF via Pillow.

Input: the ``save_interm`` OBJ sequences the tasks emit
(``<out>-0.05.obj`` ... for equilibrium continuation snapshots,
``<out>-0.obj`` ... for the twist schedules; reference
``fea/main.cpp:313-341,388-414,523-541``).

Usage:
    python scripts/make_vid.py "cuboid-twist-*.obj" --out twist.gif
    python scripts/make_vid.py frame1.obj frame2.obj ... --out seq.gif
"""

import argparse
import glob
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from mpl_toolkits.mplot3d import art3d  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mesh_visual import load_obj  # noqa: E402


def _frame_key(path):
    """Sort numerically on the trailing number(s) in the filename."""
    # unsigned: filename hyphens are separators, not minus signs
    nums = re.findall(r"\d*\.?\d+", os.path.basename(path))
    return [float(x) for x in nums] if nums else [0.0]


def render_frame(ax, verts, faces, lims):
    ax.clear()
    tris = verts[faces]
    coll = art3d.Poly3DCollection(
        tris, facecolor="#8fb8de", edgecolor="k", linewidths=0.05,
        alpha=1.0,
    )
    ax.add_collection3d(coll)
    (x0, x1), (y0, y1), (z0, z1) = lims
    ax.set_xlim(x0, x1)
    ax.set_ylim(y0, y1)
    ax.set_zlim(z0, z1)
    ax.set_box_aspect((x1 - x0, y1 - y0, z1 - z0))
    ax.axis("off")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("objs", nargs="+",
                   help="OBJ files or glob patterns, animated in "
                        "numeric filename order")
    p.add_argument("--out", default="anim.gif")
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--size", type=float, default=4.0)
    args = p.parse_args()

    paths = []
    for pat in args.objs:
        hits = sorted(glob.glob(pat), key=_frame_key)
        paths.extend(hits if hits else [pat])
    if not paths:
        raise SystemExit("no OBJ frames found")

    meshes = [load_obj(pth) for pth in paths]
    allv = np.concatenate([v for v, _ in meshes])
    pad = 0.05 * (allv.max(0) - allv.min(0) + 1e-9)
    lims = [
        (allv[:, i].min() - pad[i], allv[:, i].max() + pad[i])
        for i in range(3)
    ]

    from PIL import Image

    fig = plt.figure(figsize=(args.size, args.size))
    ax = fig.add_subplot(111, projection="3d")
    frames = []
    for pth, (verts, faces) in zip(paths, meshes):
        render_frame(ax, verts, faces, lims)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())
        frames.append(Image.fromarray(buf[:, :, :3]))
        print("frame:", pth)
    plt.close(fig)

    frames[0].save(
        args.out,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / args.fps),
        loop=0,
    )
    print("wrote %s (%d frames)" % (args.out, len(frames)))


if __name__ == "__main__":
    main()
