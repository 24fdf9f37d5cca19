"""Hyperelastic material models as batched JAX expressions.

Counterpart of reference ``fea/material.{h,cpp}``: symbolic stress
expressions built on the deformation gradient F (B, dim, dim).  Because
models are plain jnp functions, the Taylor engine propagates order-k
coefficients through them automatically.

Conventions (finite elasticity):
  F        deformation gradient dx/dX
  J        det(F)
  b = FF^T left Cauchy-Green tensor
  P        first Piola-Kirchhoff stress (force per *rest* area)
  sigma    Cauchy stress (force per *deformed* area)
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax.numpy as jnp

from ..ops import batched_det, batched_inv, batched_mul_eye, batched_transpose
from ..ops.svd_w import polar_w, svd_w
from ..utils import SANMError


class EnergyModel(enum.Enum):
    """Reference ``fea::EnergyModel`` (``fea/material.h:50-55``)."""

    NEOHOOKEAN_I = "neohookean_i"  # incompressible neo-hookean
    NEOHOOKEAN_C = "neohookean_c"  # compressible neo-hookean
    ARAP = "arap"  # as-rigid-as-possible
    StVK_STRETCH = "stvk_stretch"  # stretch term of St. Venant-Kirchhoff

    @staticmethod
    def from_name(name: str) -> "EnergyModel":
        for e in EnergyModel:
            if e.value == name:
                return e
        raise SANMError(f"unknown energy model {name!r}")


@dataclass(frozen=True)
class MaterialProperty:
    """Elastic moduli (reference ``fea::MaterialProperty``,
    ``fea/material.h:19-48``, conversions ``material.cpp:10-18``)."""

    young_modulus: float
    poisson_ratio: float
    density: float = 0.0

    @property
    def bulk_modulus(self):  # K
        return self.young_modulus / (3.0 * (1.0 - 2.0 * self.poisson_ratio))

    @property
    def shear_modulus(self):  # mu (Lame second)
        return self.young_modulus / (2.0 * (1.0 + self.poisson_ratio))

    @property
    def lame_first(self):  # lambda
        E, nu = self.young_modulus, self.poisson_ratio
        return E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

    @staticmethod
    def from_young_poisson(E, nu, density=0.0):
        return MaterialProperty(E, nu, density)


def _frob2(F):
    """|F|_F^2 per batch element, kept (B, 1, 1) for broadcasting."""
    return jnp.sum(F * F, axis=(-1, -2))[:, None, None]


def pk1(energy_model: EnergyModel, material: MaterialProperty, F, dim: int):
    """First Piola-Kirchhoff stress P(F) (reference ``fea::pk1``,
    ``fea/material.cpp:55-99``)."""
    mu = material.shear_modulus
    if energy_model == EnergyModel.NEOHOOKEAN_I:
        k = material.bulk_modulus
        FTinv = batched_transpose(batched_inv(F))
        J = batched_det(F)[:, None, None]
        Ic = _frob2(F)
        J23 = J ** (-2.0 / 3.0)
        t2 = ((-mu / 3.0) * J23 * Ic + k * J * J - k * J) * FTinv
        return mu * J23 * F + t2
    if energy_model == EnergyModel.NEOHOOKEAN_C:
        lam = material.lame_first
        FTinv = batched_transpose(batched_inv(F))
        J = batched_det(F)[:, None, None]
        return mu * F - mu * FTinv + lam * jnp.log(J) * FTinv
    if energy_model == EnergyModel.ARAP:
        return (F - polar_w(F, True)) * mu
    if energy_model == EnergyModel.StVK_STRETCH:
        b = jnp.einsum("bij,bkj->bik", F, F, precision="highest")
        return mu * (
            jnp.einsum("bij,bjk->bik", b, F, precision="highest") - F
        )
    raise SANMError(f"pk1 unimplemented for {energy_model}")


def cauchy_stress(
    energy_model: EnergyModel, material: MaterialProperty, F, dim: int
):
    """Cauchy stress sigma(F) (reference ``fea::cauchy_stress``,
    ``fea/material.cpp:20-53``); used by the inverse-design models since
    it acts on *deformed* normals."""
    mu = material.shear_modulus
    b = jnp.einsum("bij,bkj->bik", F, F, precision="highest")
    J = batched_det(F)
    if energy_model == EnergyModel.NEOHOOKEAN_I:
        k = material.bulk_modulus
        Ic = _frob2(F)
        J53 = (J ** (-5.0 / 3.0))[:, None, None]
        t2 = batched_mul_eye(
            (-mu / 3.0) * (J53 * Ic)[:, 0, 0] + k * J - k, dim
        )
        return mu * J53 * b + t2
    if energy_model == EnergyModel.NEOHOOKEAN_C:
        lam = material.lame_first
        Jinv = (J ** (-1.0))[:, None, None]
        xI = mu * Jinv + lam * Jinv * jnp.log(Jinv)
        return mu * Jinv * b - batched_mul_eye(xI[:, 0, 0], dim)
    raise SANMError(f"cauchy_stress unimplemented for {energy_model}")


def elastic_potential_density(
    energy_model: EnergyModel, material: MaterialProperty, F, dim: int
):
    """Per-element elastic energy density; returns None when the model
    does not provide it (reference ``fea::elastic_potential_density``,
    ``fea/material.cpp:101-115``, ARAP only)."""
    if energy_model == EnergyModel.ARAP:
        mu = material.shear_modulus
        d = F - polar_w(F, True)
        return jnp.sum(d * d, axis=(-1, -2)) * (mu / 2.0)
    return None
