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
solves per gradient) for Hartree-Fock AND Kohn-Sham calculations (pure,
hybrid and meta-GGA functionals, including the moving-grid/Becke-weight
derivative terms); `analytic_gradient_available` below is the exact gate.
Correlated methods, VV10/double-hybrid functionals, ghost-atom grids and
decontracted/extrapolated runs fall back to the finite-difference path,
which also remains as a validation mode (tests/test_drivers.py cross-checks
the two).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from . import common


def analytic_gradient_available(calculation, molecule=None) -> bool:
    """True when the SCF energy has a closed autodiff gradient.

    Hartree-Fock always qualifies; Kohn-Sham qualifies when the functional is
    a pure/hybrid LDA/GGA/meta-GGA with both components implemented in the
    autodiff XC library (VV10 and the MP2 part of double hybrids still go
    through finite differences, as do ghost-atom grids).
    """
    method = calculation.method
    if (calculation.extrapolate or calculation.decontract
            or method.correlated_method):
        return False
    if method.name in ("HF", "UHF"):
        return True
    if calculation.DFT_calculation:
        from ..dft import xc
        functional = calculation.functional
        if calculation.VV10 or calculation.MPC_prop > 0:
            return False
        if molecule is not None and any(a.ghost for a in molecule.atoms):
            return False
        x_ok = (functional.x_name is None
                or functional.x_name in xc.EXCHANGE_FUNCTIONALS)
        c_registry = (xc.CORRELATION_FUNCTIONALS
                      if calculation.reference == "RHF"
                      else xc.UNRESTRICTED_CORRELATION_FUNCTIONALS)
        c_ok = functional.c_name is None or functional.c_name in c_registry
        return x_ok and c_ok
    return False


_GRAD_CACHE: dict = {}


def _build_xc_energy_fn(molecule, calculation):
    """E_xc(R, P_alpha, P_beta) with the full geometry dependence traced:
    grid points and Becke weights move with the atoms, so jax.grad picks up
    the grid-derivative terms that plague hand-coded DFT gradients.

    Replaces the reference's finite-difference-only DFT gradient
    (tuna_opt.py:37-76).  The R-independent atomic grid skeleton
    (Gauss-Legendre x Lebedev) is precomputed; only the second atom's offset
    and the Becke partition are functions of R.
    """
    from ..dft import grid as dft_grid, xc

    functional = calculation.functional
    restricted = calculation.reference == "RHF"
    x_fn = xc.EXCHANGE_FUNCTIONALS.get(functional.x_name)
    c_fn = (xc.CORRELATION_FUNCTIONALS.get(functional.c_name) if restricted
            else xc.UNRESTRICTED_CORRELATION_FUNCTIONALS.get(functional.c_name))
    params = xc.XCParams(x_alpha=calculation.X_alpha,
                         method_name=calculation.method.name,
                         x_name=functional.x_name)
    needs_gradient = functional.functional_class in ("GGA", "meta-GGA")
    needs_tau = functional.functional_class == "meta-GGA"
    DFX_prop = float(calculation.DFX_prop)
    DFC_prop = float(calculation.DFC_prop)

    extent, n_radial, lebedev_order = dft_grid.grid_parameters(molecule, calculation)
    points_A, w_atomic = dft_grid.build_atomic_radial_and_angular_grid(
        extent, n_radial, lebedev_order)
    X_A = jnp.asarray(points_A[0])
    Y_A = jnp.asarray(points_A[1])
    Z_A = jnp.asarray(points_A[2])
    w_atomic = jnp.asarray(w_atomic)
    U = jnp.asarray(molecule.spherical_transformation)

    atoms = molecule.atoms
    chi = atoms[0].real_vdw_radius / atoms[1].real_vdw_radius
    u_het = (chi - 1) / (chi + 1)
    a_het = u_het / (u_het * u_het - 1)

    R0 = float(molecule.bond_length)
    bf_static = []
    for bf in molecule.cartesian_basis_functions:
        on_second = abs(float(bf.origin[2]) - R0) < abs(float(bf.origin[2]))
        coefs_norms = jnp.asarray(np.asarray(bf.coefs) * np.asarray(bf.norms))
        bf_static.append((jnp.asarray(bf.exps), coefs_norms,
                          tuple(int(q) for q in bf.lmn), on_second))

    def becke_weights(X, Y, Z, R):
        R_A = jnp.sqrt(X * X + Y * Y + Z * Z)
        R_B = jnp.sqrt(X * X + Y * Y + (Z - R) ** 2)
        s = (R_A - R_B) / R
        s = s + a_het * (1 - s * s)
        for _ in range(4):
            s = (3 * s - s**3) / 2
        return (1 - s) / 2, (1 + s) / 2

    def basis_on_grid(X, Y, Z, R):
        values, gradients = [], []
        for exps, cn, (l, m, n), on_second in bf_static:
            Xr, Yr = X, Y
            Zr = Z - R if on_second else Z
            r2 = Xr * Xr + Yr * Yr + Zr * Zr
            exp_term = jnp.exp(-exps[:, None, None] * r2[None])
            radial = jnp.einsum("i,ijk->jk", cn, exp_term)
            poly_x = Xr**l if l else 1.0
            poly_y = Yr**m if m else 1.0
            poly_z = Zr**n if n else 1.0
            P_ang = poly_x * poly_y * poly_z
            values.append(radial * P_ang)
            if needs_gradient:
                dP_dx = l * Xr**(l - 1) * poly_y * poly_z if l else jnp.zeros_like(r2)
                dP_dy = m * poly_x * Yr**(m - 1) * poly_z if m else jnp.zeros_like(r2)
                dP_dz = n * poly_x * poly_y * Zr**(n - 1) if n else jnp.zeros_like(r2)
                d_radial = jnp.einsum("i,i,ijk->jk", cn, exps, exp_term)
                gradients.append(jnp.stack([
                    radial * dP_dx - 2 * d_radial * Xr * P_ang,
                    radial * dP_dy - 2 * d_radial * Yr * P_ang,
                    radial * dP_dz - 2 * d_radial * Zr * P_ang,
                ]))
        bfs = jnp.einsum("pq,qjk->pjk", U, jnp.stack(values))
        grads = (jnp.einsum("pq,aqjk->apjk", U,
                            jnp.stack(gradients, axis=1)) if needs_gradient else None)
        return bfs, grads

    def density_quantities(P, bfs, grads):
        density = xc.clean(jnp.einsum("ij,ikl,jkl->kl", P, bfs, bfs, optimize=True))
        sigma = tau = None
        if needs_gradient:
            gradient = 2 * jnp.einsum("ij,ikl,ajkl->akl", P, bfs, grads, optimize=True)
            sigma = xc.clean(jnp.sum(gradient * gradient, axis=0), floor=xc.SIGMA_FLOOR)
            if needs_tau:
                tau = xc.clean(0.5 * jnp.einsum("ij,aikl,ajkl->kl", P, grads, grads,
                                                optimize=True))
        return density, sigma, tau

    def f_eval(fn, density, sigma, tau):
        s = sigma if getattr(fn, "needs_sigma", False) else None
        t = tau if getattr(fn, "needs_tau", False) else None
        return fn(density, s, t, params)

    def xc_energy(R, P_a, P_b):
        n_A = X_A.shape[0]
        X = jnp.concatenate([X_A, X_A], axis=0)
        Y = jnp.concatenate([Y_A, Y_A], axis=0)
        Z = jnp.concatenate([Z_A, Z_A + R], axis=0)
        becke_a, becke_b = becke_weights(X, Y, Z, R)
        w = jnp.concatenate([w_atomic * becke_a[:n_A],
                             w_atomic * becke_b[n_A:]], axis=0)
        bfs, grads = basis_on_grid(X, Y, Z, R)

        E = jnp.asarray(0.0, dtype=P_a.dtype)
        if restricted:
            density, sigma, tau = density_quantities(P_a + P_b, bfs, grads)
            if x_fn is not None:
                E = E + DFX_prop * jnp.sum(f_eval(x_fn, density, sigma, tau) * w)
            if c_fn is not None:
                E = E + DFC_prop * jnp.sum(f_eval(c_fn, density, sigma, tau) * w)
        else:
            dens_a, sigma_aa, tau_a = density_quantities(P_a, bfs, grads)
            dens_b, sigma_bb, tau_b = density_quantities(P_b, bfs, grads)
            if x_fn is not None:
                # exact spin scaling: E_x[na, nb] = (Ex[2na] + Ex[2nb]) / 2
                sa = 4 * sigma_aa if sigma_aa is not None else None
                sb = 4 * sigma_bb if sigma_bb is not None else None
                ta = 2 * tau_a if tau_a is not None else None
                tb = 2 * tau_b if tau_b is not None else None
                E = E + 0.5 * DFX_prop * (
                    jnp.sum(f_eval(x_fn, 2 * dens_a, sa, ta) * w)
                    + jnp.sum(f_eval(x_fn, 2 * dens_b, sb, tb) * w))
            if c_fn is not None:
                grad_a = 2 * jnp.einsum("ij,ikl,ajkl->akl", P_a, bfs, grads,
                                        optimize=True) if needs_gradient else None
                grad_b = 2 * jnp.einsum("ij,ikl,ajkl->akl", P_b, bfs, grads,
                                        optimize=True) if needs_gradient else None
                sigma_ab = (jnp.sum(grad_a * grad_b, axis=0)
                            if needs_gradient else None)
                needs_s = getattr(c_fn, "needs_sigma", False)
                needs_t = getattr(c_fn, "needs_tau", False)
                E = E + DFC_prop * jnp.sum(c_fn(
                    dens_a, dens_b,
                    sigma_aa if needs_s else None,
                    sigma_bb if needs_s else None,
                    sigma_ab if needs_s else None,
                    tau_a if needs_t else None,
                    tau_b if needs_t else None, params) * w)
        return E

    return xc_energy


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

    dft = bool(calculation.DFT_calculation)
    hfx = float(calculation.HFX_prop) if dft else 1.0
    xc_energy = _build_xc_energy_fn(molecule, calculation) if dft else None

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
            E_exchange = -0.25 * hfx * jnp.sum(P * K)
        else:
            K_a = jnp.einsum("ilkj,kl->ij", ERI, P_a, optimize=True)
            K_b = jnp.einsum("ilkj,kl->ij", ERI, P_b, optimize=True)
            E_exchange = -0.5 * hfx * (jnp.sum(P_a * K_a) + jnp.sum(P_b * K_b))

        E_pulay = -jnp.sum(W * S)
        E_total = E_core + E_coulomb + E_exchange + E_pulay + Z_product / R
        if xc_energy is not None:
            E_total = E_total + xc_energy(R, P_a, P_b)
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
           bool(calculation.D2), calculation.cartesian_harmonics,
           calculation.functional.x_name if calculation.DFT_calculation else None,
           calculation.functional.c_name if calculation.DFT_calculation else None,
           float(calculation.HFX_prop), float(calculation.DFX_prop),
           float(calculation.DFC_prop))
    if key not in _GRAD_CACHE:
        _GRAD_CACHE[key] = _build_gradient_fn(molecule, calculation)
    grad_fn = _GRAD_CACHE[key]

    R = float(np.linalg.norm(np.asarray(coordinates)[1] - np.asarray(coordinates)[0]))
    W = _energy_weighted_density(SCF_output, molecule,
                                 calculation.reference == "RHF")
    gradient = grad_fn(R, jnp.asarray(SCF_output.P_alpha),
                       jnp.asarray(SCF_output.P_beta), W)
    return float(gradient)
