"""Result containers shared across the framework.

Mirror of the reference Integrals/Output dataclasses
(/root/reference/TUNA/tuna_util.py:152-289), holding JAX arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np


@dataclass
class Integrals:
    S: Any
    T: Any
    V_NE: Any
    D: Any          # (3, N, N) dipole
    Q: Any          # (3, N, N) diagonal quadrupole (xx, yy, zz)
    ERI_AO: Any
    F: Any = None   # electric-field one-electron contribution
    G: Any = None   # electric-field-gradient contribution

    @property
    def H_core(self):
        H = self.T + self.V_NE
        if self.F is not None:
            H = H + self.F
        return H

    @property
    def n_basis(self):
        return self.S.shape[0]


@dataclass
class Output:
    energy: float

    kinetic_energy: float
    nuclear_electron_energy: float
    coulomb_energy: float
    exchange_energy: float
    correlation_energy: float
    electric_field_energy: float
    electric_field_gradient_energy: float

    P: Any
    P_alpha: Any
    P_beta: Any
    S: Any
    X: Any

    molecular_orbitals: Any
    molecular_orbitals_alpha: Any
    molecular_orbitals_beta: Any

    epsilons: Any
    epsilons_alpha: Any
    epsilons_beta: Any

    density: Any
    alpha_density: Any
    beta_density: Any

    F_alpha: Any
    F_beta: Any
    T: Any
    V_NE: Any

    integrals: Integrals

    dispersion_energy: float = 0.0
    D: Any = None
    Q: Any = None

    @property
    def epsilons_combined(self):
        return np.append(self.epsilons_alpha, self.epsilons_beta)

    @property
    def F(self):
        return self.F_alpha + self.F_beta

    @property
    def exchange_correlation_energy(self):
        return self.exchange_energy + self.correlation_energy

    def set_dispersion_energy(self, dispersion_energy: float) -> None:
        self.dispersion_energy = dispersion_energy
