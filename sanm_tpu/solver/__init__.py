"""Solver drivers: sparse remaps, linear solvers, ANM continuation, ANO.

Counterpart of reference L4 (``libsanm/anm.{h,cpp}``, ``ano.{h,cpp}``,
``sparse_solver.{h,cpp}``)."""

from .remap import LinearRemap  # noqa: F401
from .linear import DenseFactorSolver, make_solver  # noqa: F401
from .anm import (  # noqa: F401
    HyperParam,
    EqnHyperParam,
    ANMSolverVecScale,
    ANMEqnSolver,
    ANMImplicitSolver,
)
from .ano import ANOMinimizer, CoeffSolver  # noqa: F401
