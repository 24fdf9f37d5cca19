"""FEA application layer: static-equilibrium mesh deformation (forward
and inverse) with hyperelastic materials.

Counterpart of the reference ``fea/`` directory."""

from .material import MaterialProperty, EnergyModel, pk1, cauchy_stress  # noqa: F401
from .material import elastic_potential_density  # noqa: F401
from .mesh import TetrahedralMesh  # noqa: F401
from .remap import ShapeMatRemap, ForceOutputRemap  # noqa: F401
from .model import DeformableBody  # noqa: F401
