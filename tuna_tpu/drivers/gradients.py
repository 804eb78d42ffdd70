"""Analytic nuclear gradients by automatic differentiation.

For a converged self-consistent field the energy is variational in the
density, so the exact nuclear gradient is the partial derivative of the
energy expression at FIXED density plus the Pulay overlap term with the
energy-weighted density W:

    dE/dR = d/dR [ Tr(P H(R)) + E_2e(P, ERI(R)) - Tr(W S(R))
                   + E_field(P, D(R)) + V_NN(R) + E_D2(R) ]

Every integral derivative comes from jax.grad through the on-device
integral engine -- no finite differences and no CPHF solve.  This replaces
the reference's central-difference gradient (tuna_opt.py:37-76; two full SCF
solves per gradient) for Hartree-Fock calculations; correlated and DFT
methods fall back to the finite-difference path, which also remains as a
validation mode (tests/test_drivers.py cross-checks the two).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from . import common


def analytic_gradient_available(calculation) -> bool:
    """Pure Hartree-Fock single points have a closed autodiff gradient."""
    method = calculation.method
    return (method.name in ("HF", "UHF")
            and not calculation.DFT_calculation
            and not calculation.extrapolate
            and not calculation.decontract
            and not method.correlated_method)


_GRAD_CACHE: dict = {}


def _build_gradient_fn(molecule, calculation):
    plan = common.get_integral_plan(molecule)
    charges = jnp.asarray(np.array([float(c) for c in molecule.charges]))
    masses = np.asarray(molecule.masses, dtype=np.float64)
    mass_fraction = float(masses[1] / masses.sum())
    U = (None if calculation.cartesian_harmonics
         else jnp.asarray(molecule.spherical_transformation))
    restricted = calculation.reference == "RHF"

    use_field = bool(np.linalg.norm(calculation.electric_field) > 0)
    use_field_gradient = bool(np.linalg.norm(calculation.electric_field_gradient) > 0)
    field = jnp.asarray(calculation.electric_field)
    field_gradient = jnp.asarray(calculation.electric_field_gradient)

    use_d2 = bool(calculation.D2) and not calculation.monatomic
    if use_d2:
        atoms = molecule.atoms
        d2_C6 = float(np.sqrt(atoms[0].C6 * atoms[1].C6))
        d2_vdw = float(atoms[0].vdw_radius + atoms[1].vdw_radius)
        d2_S6 = calculation.functional.D2_S6 if calculation.DFT_calculation else 1.2

    Z_product = float(np.prod([float(c) for c in molecule.charges]))

    def total_energy(R, P_a, P_b, W):
        coords = jnp.stack([jnp.zeros(3),
                            jnp.array([0.0, 0.0, 1.0]) * R])
        S, T, V_NE, D, Q = plan.one_electron(coords, charges, mass_fraction * R)
        ERI = plan.eri(coords)
        if U is not None:
            S = U @ S @ U.T
            T = U @ T @ U.T
            V_NE = U @ V_NE @ U.T
            D = jnp.einsum("mw,awx,nx->amn", U, D, U)
            Q = jnp.einsum("mw,awx,nx->amn", U, Q, U)
            for _ in range(4):
                ERI = jnp.moveaxis(jnp.tensordot(U, ERI, axes=(1, 0)), 0, 3)

        P = P_a + P_b
        H = T + V_NE
        if use_field:
            H = H + jnp.einsum("i,ijk->jk", field, D)
        if use_field_gradient:
            Q_stack = jnp.stack([Q[0], Q[0], Q[1]])
            H = H + jnp.einsum("i,ijk->jk", field_gradient, Q_stack)

        E_core = jnp.sum(P * H)
        J = jnp.einsum("ijkl,kl->ij", ERI, P, optimize=True)
        E_coulomb = 0.5 * jnp.sum(P * J)
        if restricted:
            K = jnp.einsum("ilkj,kl->ij", ERI, P, optimize=True)
            E_exchange = -0.25 * jnp.sum(P * K)
        else:
            K_a = jnp.einsum("ilkj,kl->ij", ERI, P_a, optimize=True)
            K_b = jnp.einsum("ilkj,kl->ij", ERI, P_b, optimize=True)
            E_exchange = -0.5 * (jnp.sum(P_a * K_a) + jnp.sum(P_b * K_b))

        E_pulay = -jnp.sum(W * S)
        E_total = E_core + E_coulomb + E_exchange + E_pulay + Z_product / R
        if use_d2:
            f_damp = 1.0 / (1.0 + jnp.exp(-20.0 * (R / d2_vdw - 1.0)))
            E_total = E_total - d2_S6 * d2_C6 / R**6 * f_damp
        return E_total

    return jax.jit(jax.grad(total_energy, argnums=0))


def _energy_weighted_density(SCF_output, molecule, restricted):
    if restricted:
        C_occ = jnp.asarray(SCF_output.molecular_orbitals)[:, :molecule.n_doubly_occ]
        eps = jnp.asarray(SCF_output.epsilons)[:molecule.n_doubly_occ]
        return 2.0 * (C_occ * eps) @ C_occ.T
    C_a = jnp.asarray(SCF_output.molecular_orbitals_alpha)[:, :molecule.n_alpha]
    e_a = jnp.asarray(SCF_output.epsilons_alpha)[:molecule.n_alpha]
    W = (C_a * e_a) @ C_a.T
    if molecule.n_beta > 0:
        C_b = jnp.asarray(SCF_output.molecular_orbitals_beta)[:, :molecule.n_beta]
        e_b = jnp.asarray(SCF_output.epsilons_beta)[:molecule.n_beta]
        W = W + (C_b * e_b) @ C_b.T
    return W


def calculate_analytic_gradient(molecule, calculation, SCF_output, coordinates):
    """dE/dR for the converged SCF state at this geometry."""
    key = (id(common.get_integral_plan(molecule)), calculation.reference,
           bool(np.linalg.norm(calculation.electric_field) > 0),
           bool(np.linalg.norm(calculation.electric_field_gradient) > 0),
           bool(calculation.D2), calculation.cartesian_harmonics)
    if key not in _GRAD_CACHE:
        _GRAD_CACHE[key] = _build_gradient_fn(molecule, calculation)
    grad_fn = _GRAD_CACHE[key]

    R = float(np.linalg.norm(np.asarray(coordinates)[1] - np.asarray(coordinates)[0]))
    W = _energy_weighted_density(SCF_output, molecule,
                                 calculation.reference == "RHF")
    gradient = grad_fn(R, jnp.asarray(SCF_output.P_alpha),
                       jnp.asarray(SCF_output.P_beta), W)
    return float(gradient)
