#!/usr/bin/env python
"""Small OBJ utilities — counterparts of the reference's render/tooling
helpers that do not warrant their own files:

* ``renormal``: recompute area-weighted vertex normals of an OBJ and
  rewrite it (reference ``render/renormal.py``, a pymeshlab wrapper;
  pymeshlab is not available in this environment, so the normals come
  from the same area-weighted accumulation ``fea/mesh.py`` uses).
* ``replace-vtx``: replace the vertex coordinates of an OBJ from a
  plain-text file, one ``x y z`` per line (reference
  ``utils/replace_vtx_coord.py``).

Usage:
    python scripts/obj_tools.py renormal in.obj out.obj
    python scripts/obj_tools.py replace-vtx in.obj vtx.txt out.obj
"""

import argparse

import numpy as np


def read_obj(path):
    verts, faces, other = [], [], []
    for line in open(path):
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
            faces.append(idx)
        else:
            other.append(line)
    return np.asarray(verts), faces, other


def vertex_normals(verts, faces):
    """Area-weighted vertex normals (triangulating any polygon fan)."""
    normals = np.zeros_like(verts)
    for face in faces:
        for i in range(1, len(face) - 1):
            a, b, c = face[0], face[i], face[i + 1]
            n = np.cross(verts[b] - verts[a], verts[c] - verts[a])
            normals[a] += n
            normals[b] += n
            normals[c] += n
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.where(lens > 0, lens, 1.0)


def cmd_renormal(args):
    verts, faces, _ = read_obj(args.input)
    normals = vertex_normals(verts, faces)
    with open(args.output, "w") as f:
        for v in verts:
            f.write("v %.17g %.17g %.17g\n" % tuple(v))
        for n in normals:
            f.write("vn %.6g %.6g %.6g\n" % tuple(n))
        for face in faces:
            f.write(
                "f "
                + " ".join("%d//%d" % (i + 1, i + 1) for i in face)
                + "\n"
            )


def cmd_replace_vtx(args):
    vtx = [ln.strip() for ln in open(args.vtx) if ln.strip()]
    vid = 0
    with open(args.obj) as fin, open(args.output, "w") as fout:
        for line in fin:
            if line.startswith("v "):
                fout.write("v %s\n" % vtx[vid])
                vid += 1
            else:
                fout.write(line)
    if vid != len(vtx):
        raise SystemExit(
            f"vertex count mismatch: obj has {vid}, file has {len(vtx)}"
        )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("renormal")
    r.add_argument("input")
    r.add_argument("output")
    r.set_defaults(fn=cmd_renormal)
    s = sub.add_parser("replace-vtx")
    s.add_argument("obj")
    s.add_argument("vtx")
    s.add_argument("output")
    s.set_defaults(fn=cmd_replace_vtx)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
