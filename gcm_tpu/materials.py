"""Material models and per-node material fields.

TPU-native counterpart of the reference's ``IsotropicMaterial`` /
``OrthotropicMaterial`` (SURVEY.md §2 component 2; BASELINE.json: "material
model (Lame parameters, density)"). Heterogeneous media are represented as
HBM-resident per-node arrays of the *derived* characteristic quantities the
stage kernel actually consumes — wave speeds, impedances, and the
zero-invariant coupling ratio — so the hot kernel does no divisions/sqrt.

All quantities are SI: rho [kg/m^3], lambda/mu [Pa], speeds [m/s].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class IsotropicMaterial:
    """Linear isotropic elastic material (rho, Lame lambda, mu).

    For acoustic media set ``mu = 0`` (then ``c_p = sqrt(lambda/rho)`` is the
    sound speed and ``lambda`` is the bulk modulus K).
    """

    rho: float
    lam: float
    mu: float = 0.0

    @staticmethod
    def from_speeds(rho: float, cp: float, cs: float = 0.0) -> "IsotropicMaterial":
        mu = rho * cs * cs
        lam = rho * cp * cp - 2.0 * mu
        return IsotropicMaterial(rho=rho, lam=lam, mu=mu)

    @property
    def cp(self) -> float:
        return math.sqrt((self.lam + 2.0 * self.mu) / self.rho)

    @property
    def cs(self) -> float:
        return math.sqrt(self.mu / self.rho)


@dataclasses.dataclass(frozen=True)
class OrthotropicMaterial:
    """Orthotropic elastic material (rho + 9 stiffness constants c_ij).

    Parity placeholder for the reference's OrthotropicMaterial (SURVEY.md §2
    component 2). The per-axis characteristic decomposition for orthotropy is
    also closed-form (wave speeds sqrt(c_ii/rho) along each principal axis);
    full solver support lands with the orthotropic model.
    """

    rho: float
    c11: float
    c12: float
    c13: float
    c22: float
    c23: float
    c33: float
    c44: float  # yz shear
    c55: float  # xz shear
    c66: float  # xy shear


@dataclasses.dataclass
class MaterialFields:
    """Per-node derived characteristic fields (struct-of-arrays pytree).

    Every array has the spatial shape of the grid. These are the only
    material quantities the stage kernels read:

    - ``cp``, ``cs``  : P/S wave speeds (cs == 0 for acoustic media)
    - ``zp``, ``zs``  : acoustic impedances rho*cp, rho*cs
    - ``kappa``       : lambda/(lambda+2mu) — couples the zero-speed stress
                        invariants to the P update (SURVEY.md §0.2)
    - ``rho``         : kept for sources/diagnostics
    """

    cp: Any
    cs: Any
    zp: Any
    zs: Any
    kappa: Any
    rho: Any

    @staticmethod
    def from_arrays(rho, lam, mu, xp=np, dtype=None) -> "MaterialFields":
        """Build derived fields from rho/lambda/mu arrays (any array lib)."""
        dtype = dtype or xp.float32
        rho = xp.asarray(rho, dtype=dtype)
        lam = xp.asarray(lam, dtype=dtype)
        mu = xp.asarray(mu, dtype=dtype)
        m2 = lam + 2.0 * mu
        cp = xp.sqrt(m2 / rho)
        cs = xp.sqrt(mu / rho)
        return MaterialFields(
            cp=cp,
            cs=cs,
            zp=rho * cp,
            zs=rho * cs,
            kappa=lam / m2,
            rho=rho,
        )

    @staticmethod
    def uniform(material: IsotropicMaterial, shape, xp=np, dtype=None) -> "MaterialFields":
        ones = xp.ones(shape, dtype=dtype or xp.float32)
        return MaterialFields.from_arrays(
            material.rho * ones, material.lam * ones, material.mu * ones,
            xp=xp, dtype=dtype,
        )

    def max_cp(self) -> float:
        return float(self.cp.max())

    def z(self, wave: str):
        return {"p": self.zp, "s": self.zs}[wave]

    def c(self, wave: str):
        return {"p": self.cp, "s": self.cs}[wave]


def _register_pytree() -> None:
    import jax

    jax.tree_util.register_pytree_node(
        MaterialFields,
        lambda m: ((m.cp, m.cs, m.zp, m.zs, m.kappa, m.rho), None),
        lambda _, leaves: MaterialFields(*leaves),
    )


_register_pytree()
