"""DFT quadrature grids: Gauss-Legendre radial x Lebedev angular with Becke
diatomic partitioning, plus basis-function (and gradient) evaluation on the
grid.

Capability parity with /root/reference/TUNA/tuna_dft.py:94-787.  Grid
construction is host-side NumPy (geometry-dependent but cheap); the per-point
basis evaluation is vectorised and returned as JAX arrays so SCF XC
evaluation runs fully on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.integrate import lebedev_rule

from ..output import check, log, timer, warning
from . import xc

LEBEDEV_ORDERS = np.array([3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29,
                           31, 35, 41, 47, 53, 59, 65, 71, 77, 83, 89, 95, 101,
                           107, 113, 119, 125, 131])


def build_atomic_radial_and_angular_grid(radial_grid_cutoff, n_radial,
                                         lebedev_order, radial_power=3):
    """Radial Gauss-Legendre (mapped r = R t^3) x Lebedev angular grid."""
    t_nodes, t_weights = np.polynomial.legendre.leggauss(n_radial)
    t = (t_nodes + 1) / 2
    w_t = t_weights / 2
    r = radial_grid_cutoff * t**radial_power
    dr_dt = radial_grid_cutoff * radial_power * t**(radial_power - 1)
    weights_radial = w_t * dr_dt

    directions, weights_angular = lebedev_rule(lebedev_order)
    points = np.einsum("m,in->imn", r, directions)
    weights = np.einsum("m,m,n->mn", weights_radial, r**2, weights_angular)
    return points, weights


def calculate_Becke_diatomic_weights(X, Y, Z, bond_length, atoms, steepness=4):
    """Becke fuzzy-cell weights with heteronuclear size adjustment."""
    R_A = np.sqrt(X * X + Y * Y + Z * Z)
    R_B = np.sqrt(X * X + Y * Y + (Z - bond_length) ** 2)
    s = (R_A - R_B) / bond_length

    chi = atoms[0].real_vdw_radius / atoms[1].real_vdw_radius
    u = (chi - 1) / (chi + 1)
    a = u / (u * u - 1)
    s = s + a * (1 - s * s)

    for _ in range(steepness):
        s = (3 * s - s**3) / 2

    return (1 - s) / 2, (1 + s) / 2


def build_molecular_grid(radial_grid_cutoff, n_radial, lebedev_order,
                         bond_length, atoms):
    points_A, atomic_weights_A = build_atomic_radial_and_angular_grid(
        radial_grid_cutoff, n_radial, lebedev_order)
    X_A, Y_A, Z_A = points_A

    if len(atoms) == 1 or (len(atoms) == 2 and any(a.ghost for a in atoms)):
        return points_A, atomic_weights_A

    X_B, Y_B, Z_B = X_A, Y_A, Z_A + bond_length
    X = np.concatenate([X_A, X_B], axis=0)
    Y = np.concatenate([Y_A, Y_B], axis=0)
    Z = np.concatenate([Z_A, Z_B], axis=0)
    points = np.stack((X, Y, Z), axis=0)

    weights_A, weights_B = calculate_Becke_diatomic_weights(X, Y, Z, bond_length, atoms)
    n_A = X_A.shape[0]
    weights = np.concatenate([atomic_weights_A * weights_A[:n_A],
                              atomic_weights_A * weights_B[n_A:]], axis=0)
    return points, weights


def construct_basis_functions_on_grid(basis_functions, points, spherical_transform):
    """Evaluate (spherical) basis functions on the grid: (n_basis, N, M)."""
    if len(points) == 3:
        X, Y, Z = points
    else:
        X, Z = points[0], points[1]
        Y = np.zeros_like(X)

    values = []
    for bf in basis_functions:
        Xr = X - bf.origin[0]
        Yr = Y - bf.origin[1]
        Zr = Z - bf.origin[2]
        l, m, n = bf.lmn
        r2 = Xr * Xr + Yr * Yr + Zr * Zr
        exp_term = np.exp(-np.einsum("i,jk->ijk", bf.exps, r2))
        contracted = np.einsum("i,i,ijk->jk", bf.coefs, bf.norms, exp_term)
        values.append(contracted * Xr**l * Yr**m * Zr**n)
    bfs = np.array(values)
    return np.einsum("pq,qjk->pjk", spherical_transform, bfs)


def construct_basis_function_gradients_on_grid(basis_functions, points,
                                               spherical_transform):
    """Analytic gradients of basis functions on the grid: (3, n_basis, N, M)."""
    if len(points) == 3:
        X, Y, Z = points
    else:
        X, Z = points[0], points[1]
        Y = np.zeros_like(X)

    grads = []
    for bf in basis_functions:
        Xr = X - bf.origin[0]
        Yr = Y - bf.origin[1]
        Zr = Z - bf.origin[2]
        l, m, n = bf.lmn
        r2 = Xr * Xr + Yr * Yr + Zr * Zr
        exp_term = np.exp(-np.einsum("i,jk->ijk", bf.exps, r2))

        poly_x, poly_y, poly_z = Xr**l, Yr**m, Zr**n
        P = poly_x * poly_y * poly_z
        dP_dx = l * Xr**(l - 1) * poly_y * poly_z if l > 0 else np.zeros_like(P)
        dP_dy = m * poly_x * Yr**(m - 1) * poly_z if m > 0 else np.zeros_like(P)
        dP_dz = n * poly_x * poly_y * Zr**(n - 1) if n > 0 else np.zeros_like(P)

        exps = bf.exps[:, None, None]
        primitives = np.array([
            exp_term * (dP_dx - 2 * exps * Xr * P),
            exp_term * (dP_dy - 2 * exps * Yr * P),
            exp_term * (dP_dz - 2 * exps * Zr * P),
        ])
        grads.append(np.einsum("i,i,aijk->ajk", bf.coefs, bf.norms, primitives))
    grads = np.array(grads)
    return np.einsum("pq,qajk->apjk", spherical_transform, grads)


def construct_density_on_grid(P, bfs_on_grid, clean_density=True):
    density = jnp.einsum("ij,ikl,jkl->kl", jnp.asarray(P), bfs_on_grid,
                         bfs_on_grid, optimize=True)
    return xc.clean(density) if clean_density else density


def integrate_on_grid(integrand, weights):
    return float(jnp.sum(jnp.asarray(integrand).reshape(weights.shape) * weights))


def integrate_final_density(alpha_density, beta_density, density, weights,
                            calculation, silent=False):
    w = jnp.asarray(weights)
    n_a = float(jnp.sum(jnp.asarray(alpha_density).reshape(w.shape) * w))
    n_b = float(jnp.sum(jnp.asarray(beta_density).reshape(w.shape) * w))
    n_total = float(jnp.sum(jnp.asarray(density).reshape(w.shape) * w))
    log(f"\n Integral of the alpha density:       {n_a:13.10f}", calculation, 1, silent=silent)
    log(f" Integral of the beta density:        {n_b:13.10f}\n", calculation, 1, silent=silent)
    log(f" Integral of the total density:       {n_total:13.10f}", calculation, 1, silent=silent)


def grid_parameters(molecule, calculation):
    """Static grid dimensions (extent, n_radial, Lebedev order) for this
    molecule/accuracy pair -- geometry-independent, so shared between SCF grid
    setup and the analytic-gradient path."""
    extent_multiplier = calculation.grid_conv["extent_multiplier"]
    integral_accuracy = (calculation.grid_conv["integral_accuracy"]
                         if not calculation.integral_accuracy_requested
                         else calculation.integral_accuracy)

    extent = extent_multiplier * max(
        a.real_vdw_radius for a in molecule.atoms) / 6

    n = int(integral_accuracy * 9)
    Lebedev_order = int(LEBEDEV_ORDERS[np.abs(LEBEDEV_ORDERS - n).argmin()])
    n_radial = int(extent * integral_accuracy)
    return extent, n_radial, Lebedev_order


def set_up_integration_grid(molecule, P_guess_alpha, P_guess_beta, calculation,
                            silent):
    """Build the molecular grid, evaluate the basis (and gradients) on it."""
    timer("Integration grid setup", 0)
    log(f' Setting up DFT integration grid with "{calculation.grid_conv["name"]}" '
        "accuracy...  ", calculation, 1, end="", silent=silent)

    extent, n_radial, Lebedev_order = grid_parameters(molecule, calculation)

    points, weights = build_molecular_grid(extent, n_radial, Lebedev_order,
                                           molecule.bond_length, molecule.atoms)
    log("[Done]", calculation, 1, silent=silent)

    total_points = points.shape[1] * points.shape[2]
    log(f"\n Integration grid has {n_radial} radial and {points.shape[2]} angular "
        f"points, a Lebedev order of {Lebedev_order}.", calculation, 1, silent=silent)
    log(f" In total there are {total_points} grid points, "
        f"{total_points // molecule.n_atoms} per atom.", calculation, 1, silent=silent)

    log("\n Building guess density on grid...  ", calculation, 1, end="", silent=silent)
    bfs_on_grid = jnp.asarray(construct_basis_functions_on_grid(
        molecule.cartesian_basis_functions, points, molecule.spherical_transformation))

    needs_gradients = (calculation.functional.functional_class in ("GGA", "meta-GGA")
                       or calculation.VV10)
    bf_gradients_on_grid = (jnp.asarray(construct_basis_function_gradients_on_grid(
        molecule.cartesian_basis_functions, points, molecule.spherical_transformation))
        if needs_gradients else None)

    weights = jnp.asarray(weights)
    alpha_density = construct_density_on_grid(P_guess_alpha, bfs_on_grid)
    beta_density = construct_density_on_grid(P_guess_beta, bfs_on_grid)
    density = alpha_density + beta_density
    log("[Done]", calculation, 1, silent=silent)

    n_a = float(jnp.sum(alpha_density * weights))
    n_b = float(jnp.sum(beta_density * weights))
    n_total = float(jnp.sum(density * weights))
    log(f"\n Integral of the guess alpha density: {n_a:14.10f}", calculation, 1, silent=silent)
    log(f" Integral of the guess beta density:  {n_b:14.10f}\n", calculation, 1, silent=silent)
    log(f" Integral of the guess total density: {n_total:14.10f}\n", calculation, 1, silent=silent)

    if abs(n_total - molecule.n_electrons) > 0.0001:
        warning(" Integral of density is far from the number of electrons! "
                "Be careful with your results.")
        check(abs(n_total - molecule.n_electrons) < 0.5,
              "Integral for the density is completely wrong!")

    log(f" Using {100 * calculation.DFX_prop:.1f}% density functional exchange and "
        f"{100 * calculation.HFX_prop:.1f}% Hartree-Fock exchange.", calculation, 2, silent=silent)
    log(f" Using {100 * calculation.DFC_prop:.1f}% density functional correlation and "
        f"{100 * calculation.MPC_prop:.1f}% Moller-Plesset correlation.\n",
        calculation, 2, silent=silent)

    timer("Integration grid setup", 1)
    return bfs_on_grid, weights, bf_gradients_on_grid, points
