"""Mesh <-> solver-vector remaps.

Counterparts of reference ``MeshShapeMatTrans`` / ``MeshForceOutputTrans``
(``fea/mesh.h:78-146``, ``fea/mesh_template.h:19-161``):

* :class:`ShapeMatRemap` maps the flat unknown vector (free vertex
  coordinates, optionally + the continuation parameter t) to the batched
  per-tet shape matrices Ds (T, 3, 3), with fixed coordinates folded
  into a constant bias;
* :class:`ForceOutputRemap` maps batched per-tet stress tensors to the
  per-unknown nodal force: f[(v,c)] = sum over adjacent tets e of
  sigma_e[c, :] . n_{e, corner(v)}.

Construction is host NumPy (static mesh topology); the products are
:class:`~sanm_tpu.solver.remap.LinearRemap` padded index arrays living
on device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..solver.remap import LinearRemap
from ..utils import sanm_assert


class ShapeMatRemap:
    """Reference ``MeshShapeMatTrans`` (``fea/mesh_template.h:19-111``).

    ``fixed_mask``: (V, dim) bool, True = coordinate is fixed (not an
    unknown).  ``init_vtx_coord``: starting coordinates (defaults to the
    mesh's).  ``vtx_delta``: when given, output entry gains the extra
    coefficient ``delta[vi]-delta[v0]`` on the trailing unknown t
    (implicit continuation)."""

    def __init__(
        self,
        mesh,
        fixed_mask,
        init_vtx_coord: Optional[np.ndarray] = None,
        vtx_delta: Optional[np.ndarray] = None,
    ):
        self.mesh = mesh
        dim = 3
        V = mesh.nr_vertices
        fixed = np.asarray(fixed_mask, bool).reshape(V, dim)
        if init_vtx_coord is None:
            init_vtx_coord = mesh.vertices
        init_vtx_coord = np.asarray(init_vtx_coord).reshape(V, dim)
        self.has_delta = vtx_delta is not None

        from ..native import build_shape_remap_native

        nat = build_shape_remap_native(
            mesh.tets, fixed, init_vtx_coord, vtx_delta
        )
        if nat is not None:
            idx, coef, bias, x0, vloc, vtx2uidx, n = nat
            self.vtx2uidx = vtx2uidx.astype(np.int64)
            self.x0 = x0
            self.vertex_loc = vloc.astype(np.int64)
            self.n_unknown_vtx = n
            self.fixed_mask = fixed
            self.bias = bias
            inp_size = n + (1 if self.has_delta else 0)
            self.remap = LinearRemap.from_padded(
                idx, coef, inp_size, (mesh.nr_tet, dim, dim)
            )
            return

        # unknown numbering: (vertex, coord) row-major over free coords
        vtx2uidx = -np.ones((V, dim), np.int64)
        free = ~fixed
        n_unknown = int(free.sum())
        vtx2uidx[free] = np.arange(n_unknown)
        self.vtx2uidx = vtx2uidx
        self.x0 = init_vtx_coord[free].astype(np.float64)
        # vertex_loc[u] = (vertex, coord)
        self.vertex_loc = np.argwhere(free)
        self.n_unknown_vtx = n_unknown
        self.fixed_mask = fixed

        T = mesh.nr_tet
        tets = mesh.tets
        bias = np.zeros((T, dim, dim))
        rows = []
        for e in range(T):
            v0 = tets[e, 0]
            rows_e = [None] * (dim * dim)
            for dm in range(1, dim + 1):
                vi = tets[e, dm]
                for r in range(dim):
                    # Ds[r, dm-1] = x[vi][r] - x[v0][r]; flat output
                    # position follows row-major (r, dm-1)
                    entries = []
                    u0 = vtx2uidx[v0, r]
                    if u0 < 0:
                        bias[e, r, dm - 1] -= init_vtx_coord[v0, r]
                    else:
                        entries.append((int(u0), -1.0))
                    ui = vtx2uidx[vi, r]
                    if ui < 0:
                        bias[e, r, dm - 1] += init_vtx_coord[vi, r]
                    else:
                        entries.append((int(ui), 1.0))
                    if self.has_delta:
                        d = float(
                            vtx_delta[vi, r] - vtx_delta[v0, r]
                        )
                        if d != 0.0:
                            entries.append((n_unknown, d))
                    rows_e[r * dim + (dm - 1)] = entries
            rows.extend(rows_e)
        self.bias = bias
        inp_size = n_unknown + (1 if self.has_delta else 0)
        self.remap = LinearRemap(rows, inp_size, (T, dim, dim))

    def copy_vtx_values(self, vtx_values):
        """Gather per-vertex values (e.g. load forces) into the unknown
        ordering (reference ``copy_vtx_values``,
        ``fea/mesh_template.h:113-127``)."""
        vals = np.asarray(vtx_values).reshape(self.vtx2uidx.shape)
        return vals[~self.fixed_mask]


class ForceOutputRemap:
    """Reference ``MeshForceOutputTrans`` (``fea/mesh_template.h:129-161``)."""

    def __init__(self, shape_trans: ShapeMatRemap):
        mesh = shape_trans.mesh
        dim = 3
        norms = mesh.vertex_norms  # (T, 4, 3)

        from ..native import build_force_remap_native

        nat = build_force_remap_native(
            mesh.tets, mesh.nr_vertices, norms, shape_trans.vertex_loc
        )
        if nat is not None:
            idx, coef = nat
            self.remap = LinearRemap.from_padded(
                idx, coef, mesh.nr_tet * dim * dim,
                (shape_trans.n_unknown_vtx,),
            )
            return

        rev = mesh.vertex_reverse_list()
        rows = []
        for (v, c) in shape_trans.vertex_loc:
            entries = []
            for (e, slot) in rev[v]:
                n = norms[e, slot]
                for j in range(dim):
                    entries.append(
                        (int(e * dim * dim + c * dim + j), float(n[j]))
                    )
            rows.append(entries)
        self.remap = LinearRemap(
            rows,
            mesh.nr_tet * dim * dim,
            (shape_trans.n_unknown_vtx,),
        )
