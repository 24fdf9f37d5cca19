"""Native (C++) host-kernel tests: the ctypes builders must produce
remaps equivalent to the pure-Python fallbacks."""

import numpy as np
import pytest

from sanm_tpu import native
from sanm_tpu.fea import DeformableBody, MaterialProperty, TetrahedralMesh
from sanm_tpu.fea.remap import ForceOutputRemap, ShapeMatRemap
from helper import require_tensor_eq


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def dense_of(remap):
    """Materialize a LinearRemap as a dense matrix for comparison."""
    import jax.numpy as jnp

    M = np.zeros((remap.n_out, remap.inp_size))
    idx = remap._np_idx
    coef = remap._np_coef
    for o in range(remap.n_out):
        for s in range(idx.shape[1]):
            M[o, idx[o, s]] += coef[o, s]
    return M


def test_native_matches_python(lib, monkeypatch):
    mesh = TetrahedralMesh.make_cuboid(4, 3, 2, 0.3)
    rng = np.random.default_rng(0)
    fixed = rng.random((mesh.nr_vertices, 3)) < 0.3
    delta = rng.normal(size=(mesh.nr_vertices, 3))
    delta[rng.random(mesh.nr_vertices) < 0.5] = 0.0

    tr_nat = ShapeMatRemap(mesh, fixed, None, delta)
    fr_nat = ForceOutputRemap(tr_nat)

    # force the Python fallback
    monkeypatch.setattr(
        "sanm_tpu.native.build_shape_remap_native", lambda *a: None
    )
    monkeypatch.setattr(
        "sanm_tpu.native.build_force_remap_native", lambda *a: None
    )
    tr_py = ShapeMatRemap(mesh, fixed, None, delta)
    fr_py = ForceOutputRemap(tr_py)

    assert tr_nat.n_unknown_vtx == tr_py.n_unknown_vtx
    require_tensor_eq(tr_nat.x0, tr_py.x0, 1e-15, msg="x0")
    require_tensor_eq(tr_nat.bias, tr_py.bias, 1e-15, msg="bias")
    require_tensor_eq(
        tr_nat.vertex_loc, tr_py.vertex_loc, 1e-15, msg="vertex_loc"
    )
    require_tensor_eq(
        dense_of(tr_nat.remap), dense_of(tr_py.remap), 1e-15,
        msg="shape remap matrix",
    )
    require_tensor_eq(
        dense_of(fr_nat.remap), dense_of(fr_py.remap), 1e-12,
        msg="force remap matrix",
    )


def test_native_transpose(lib):
    from sanm_tpu.solver.remap import LinearRemap

    rng = np.random.default_rng(1)
    rows = []
    for o in range(40):
        k = rng.integers(0, 4)
        rows.append(
            [(int(rng.integers(0, 17)), float(rng.normal()))
             for _ in range(k)]
        )
    rm = LinearRemap(rows, 17, (40,))
    tidx, tcoef = rm.transposed_padded()
    # reconstruct the dense matrix from the transpose
    M = np.zeros((40, 17))
    for i in range(17):
        for t in range(tidx.shape[1]):
            if tcoef[i, t] != 0:
                M[tidx[i, t], i] += tcoef[i, t]
    require_tensor_eq(M, dense_of(rm), 1e-15, msg="transpose")
