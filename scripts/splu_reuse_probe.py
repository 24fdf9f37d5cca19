"""Measure how much of scipy splu's per-restart cost is reusable.

The ANM hybrid path factorizes a topology-static stiffness matrix once
per continuation restart (reference: PARDISO analyze-once + N numeric
factorizations, libsanm/sparse_solver.cpp:327-421).  scipy exposes no
analyze/factorize split, but the COLAMD column ordering is a pure
function of the sparsity pattern: caching ``lu.perm_c`` from the first
restart and factorizing the pre-permuted matrix with
``permc_spec='NATURAL'`` skips the ordering on every later restart.

This probe builds the armadillo-small tet-adjacency stiffness pattern
(the real mesh, random SPD-ish values) and times:
  a) splu COLAMD (status quo, one per restart)
  b) splu NATURAL on the column-pre-permuted matrix (cached ordering)
  c) the permute + solve-scatter overhead of (b)
"""

import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, ".")
from sanm_tpu.fea.mesh import TetrahedralMesh  # noqa: E402

mesh = TetrahedralMesh.from_tetgen_files("configs/model/Armadillo-small.1")
tets = np.asarray(mesh.tets)
nv = mesh.vertices.shape[0]
n = 3 * nv
print(f"mesh: V={nv} T={len(tets)} n={n}")

# vertex adjacency -> 3x3 block pattern (the true stiffness sparsity)
rows = []
cols = []
for a in range(4):
    for b in range(4):
        rows.append(tets[:, a])
        cols.append(tets[:, b])
rows = np.concatenate(rows)
cols = np.concatenate(cols)
rng = np.random.default_rng(0)
# graph-Laplacian values (SPD M-matrix): random values explode SuperLU's
# partial-pivoting fill and are unrepresentative of the real stiffness
Kv = sp.csr_matrix((-np.ones(rows.size), (rows, cols)), shape=(nv, nv))
Kv.setdiag(0.0)
Kv.eliminate_zeros()
Kv.setdiag(-np.asarray(Kv.sum(axis=1)).ravel() + 1.0)
A = sp.kron(Kv, np.eye(3) + 0.1).tocsr()
print(f"nnz={A.nnz}")
b = rng.standard_normal(n)

Ac = A.tocsc()

# a) status quo
for trial in range(3):
    t0 = time.perf_counter()
    lu = spla.splu(Ac)
    t1 = time.perf_counter()
    x = lu.solve(b)
    t2 = time.perf_counter()
    print(f"a) splu COLAMD: fact={t1-t0:.3f}s solve={t2-t1:.4f}s "
          f"resid={np.linalg.norm(A@x-b)/np.linalg.norm(b):.2e}")

# NOTE direction: SuperLU factorizes Pr*A*Pc; to reproduce the COLAMD
# fill under NATURAL the columns must be pre-permuted by the INVERSE of
# lu.perm_c (measured: the forward direction explodes fill 15x).
# MEASURED CONCLUSION (beam3_tet n=13656): COLAMD total 0.368 s vs
# pre-permuted NATURAL 0.397 s, identical LU nnz — the ordering phase is
# a negligible slice of splu, so ordering reuse across restarts is NOT
# worth it; sanm_tpu does not do it (solver/anm.py:_splu_factorize).
perm = np.argsort(lu.perm_c)
# b) cached ordering: pre-permute columns, NATURAL
for trial in range(3):
    t0 = time.perf_counter()
    Ap = Ac[:, perm]
    t1 = time.perf_counter()
    lu2 = spla.splu(Ap, permc_spec="NATURAL")
    t2 = time.perf_counter()
    y = lu2.solve(b)
    x2 = np.empty_like(y)
    x2[perm] = y
    t3 = time.perf_counter()
    print(f"b) permute={t1-t0:.3f}s splu NATURAL={t2-t1:.3f}s "
          f"solve+scatter={t3-t2:.4f}s "
          f"resid={np.linalg.norm(A@x2-b)/np.linalg.norm(b):.2e}")

# c) SymmetricMode for the (structurally symmetric) stiffness
try:
    t0 = time.perf_counter()
    lu3 = spla.splu(Ac, permc_spec="MMD_AT_PLUS_A",
                    options=dict(SymmetricMode=True,
                                 DiagPivotThresh=0.001))
    t1 = time.perf_counter()
    x3 = lu3.solve(b)
    print(f"c) splu MMD/SymmetricMode: fact={t1-t0:.3f}s "
          f"resid={np.linalg.norm(A@x3-b)/np.linalg.norm(b):.2e}")
except Exception as e:  # pragma: no cover
    print("c) failed:", e)
