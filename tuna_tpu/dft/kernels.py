"""TD-DFT exchange-correlation kernels: second functional derivatives f_xc on
the grid and their MO-basis matrix elements K_XC.

The reference hand-derives f_xc for the LDA functionals it supports in TD-DFT
(S exchange + VWN3/VWN5/PW correlation; tuna_xc.py:5956-6634) and assembles
K_XC in tuna_dft.py:1074-1327.  Here every kernel is the literal second
derivative of the same energy densities used for the SCF potential, taken by
nested automatic differentiation -- one definition serves energy, potential
and kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..output import error, log
from . import xc


# ---------------------------------------------------------------------------
# Autodiff second derivatives
# ---------------------------------------------------------------------------

def _d2_dn2(f, density):
    """Elementwise d^2 f / d n^2 for f mapping a grid array to a grid array."""
    grad = lambda n: jax.grad(lambda m: jnp.sum(f(m)))(n)
    return jax.jvp(grad, (density,), (jnp.ones_like(density),))[1]


def _d2_mixed(f, na, nb, wrt):
    """Elementwise second partials of f(na, nb): wrt in {"aa", "ab", "bb"}."""
    first = 0 if wrt[0] == "a" else 1
    second = 0 if wrt[1] == "a" else 1
    grad = lambda x, y: jax.grad(lambda p, q: jnp.sum(f(p, q)), argnums=first)(x, y)
    tangents = (jnp.ones_like(na) if second == 0 else jnp.zeros_like(na),
                jnp.zeros_like(nb) if second == 0 else jnp.ones_like(nb))
    return jax.jvp(grad, (na, nb), tangents)[1]


def _d2_dm2(f_u, density):
    """Spin-channel kernel d^2 f / d m^2 at m = 0 (m = n_a - n_b)."""
    def h(m):
        return f_u((density + m) / 2.0, (density - m) / 2.0)
    return _d2_dn2(h, jnp.zeros_like(density))


_PARAMS = xc.XCParams()


def _restricted_lda(name):
    fn = xc.CORRELATION_FUNCTIONALS[name]
    return lambda n: fn(n, None, None, _PARAMS)


def _unrestricted_lda(name):
    fn = xc.UNRESTRICTED_CORRELATION_FUNCTIONALS[name]
    return lambda na, nb: fn(na, nb, None, None, None, None, None, _PARAMS)


def slater_exchange_kernel(density, x_alpha):
    params = xc.XCParams(x_alpha=x_alpha)
    return _d2_dn2(lambda n: xc.f_slater_x(n, None, None, params), density)


def correlation_density_kernel(name, density):
    return _d2_dn2(_restricted_lda(name), density)


def correlation_spin_kernel(name, density):
    return _d2_dm2(_unrestricted_lda(name), density)


def unrestricted_correlation_kernel(name, dens_a, dens_b):
    f_u = _unrestricted_lda(name)
    f_aa = _d2_mixed(f_u, dens_a, dens_b, "aa")
    f_ab = _d2_mixed(f_u, dens_a, dens_b, "ab")
    f_bb = _d2_mixed(f_u, dens_a, dens_b, "bb")
    return f_aa, f_ab, f_bb


_TD_CORRELATION = ("VWN3", "VWN5", "PW")


def _check_td_functional(calculation):
    functional = calculation.functional
    if functional.x_name not in (None, "S") or (
            functional.c_name is not None
            and functional.c_name not in _TD_CORRELATION):
        error("Time-dependent DFT kernels are only available for LDA "
              "functionals (S exchange with VWN/PW correlation)!")


# ---------------------------------------------------------------------------
# MO-basis kernel matrices
# ---------------------------------------------------------------------------

def _mos_on_grid(bfs_on_grid, C):
    return jnp.einsum("im,ikl->mkl", jnp.asarray(C), jnp.asarray(bfs_on_grid),
                      optimize=True)


def restricted_xc_kernel_matrices(o, v, density, bfs_on_grid, molecular_orbitals,
                                  calculation, weights, silent):
    """Singlet / triplet K_XC (iajb) plus the full (ia,pq) kernel
    (parity: tuna_dft.py:1074-1170)."""
    _check_td_functional(calculation)
    functional = calculation.functional

    log("\n Evaluating molecular orbitals on grid...    ", calculation, 1, end="", silent=silent)
    bfs = jnp.asarray(bfs_on_grid)
    mos = _mos_on_grid(bfs, molecular_orbitals)
    log("[Done]", calculation, 1, silent=silent)

    log(" Evaluating exchange-correlation kernel...   ", calculation, 1, end="", silent=silent)
    density = xc.clean(jnp.asarray(density).reshape(bfs.shape[1:]))
    w = jnp.asarray(weights)

    f_X = jnp.zeros_like(density)
    if functional.x_name is not None:
        f_X = 2.0 * slater_exchange_kernel(density, calculation.X_alpha)
    f_C_singlet = f_C_triplet = jnp.zeros_like(density)
    if functional.c_name is not None:
        f_C_singlet = 2.0 * correlation_density_kernel(functional.c_name, density)
        f_C_triplet = 2.0 * correlation_spin_kernel(functional.c_name, density)
    log("[Done]", calculation, 1, silent=silent)

    log(" Calculating matrix elements...              ", calculation, 1, end="", silent=silent)
    T = jnp.einsum("imn,amn->iamn", mos[o], mos[v], optimize=True)
    K_X = jnp.einsum("iamn,jbmn,mn->iajb", T, T, f_X * w, optimize=True)
    K_C_s = jnp.einsum("iamn,jbmn,mn->iajb", T, T, f_C_singlet * w, optimize=True)
    K_C_t = jnp.einsum("iamn,jbmn,mn->iajb", T, T, f_C_triplet * w, optimize=True)
    K_XC_singlet = K_X * calculation.DFX_prop + K_C_s * calculation.DFC_prop
    K_XC_triplet = K_X * calculation.DFX_prop + K_C_t * calculation.DFC_prop

    K_XC_full = None
    if calculation.DFT_calculation:
        weighted = w * (f_X * calculation.DFX_prop + f_C_singlet * calculation.DFC_prop)
        K_XC_full = jnp.einsum("iamn,pmn,qmn->iapq", T, mos, mos * weighted,
                               optimize=True)
    log("[Done]", calculation, 1, silent=silent)
    return np.asarray(K_XC_singlet), np.asarray(K_XC_triplet), \
        (np.asarray(K_XC_full) if K_XC_full is not None else None)


def unrestricted_xc_kernel_matrices(o, v, P_alpha, P_beta, bfs_on_grid,
                                    C_spin_block, spin_labels, calculation,
                                    weights, silent, return_full_kernel=False):
    """Spin-orbital K_XC (parity: tuna_dft.py:1180-1327)."""
    _check_td_functional(calculation)
    functional = calculation.functional

    log("\n Evaluating molecular orbitals on grid...    ", calculation, 1, end="", silent=silent)
    bfs = jnp.asarray(bfs_on_grid)
    bfs_spin = jnp.concatenate([bfs, bfs], axis=0)
    mos = _mos_on_grid(bfs_spin, C_spin_block)
    log("[Done]", calculation, 1, silent=silent)

    log(" Evaluating exchange-correlation kernel...   ", calculation, 1, end="", silent=silent)
    dens_a = xc.clean(jnp.einsum("ij,ikl,jkl->kl", jnp.asarray(P_alpha), bfs, bfs, optimize=True))
    dens_b = xc.clean(jnp.einsum("ij,ikl,jkl->kl", jnp.asarray(P_beta), bfs, bfs, optimize=True))
    w = jnp.asarray(weights)

    f_X_aa = f_X_bb = jnp.zeros_like(dens_a)
    if functional.x_name is not None:
        f_X_aa = 2.0 * slater_exchange_kernel(2.0 * dens_a, calculation.X_alpha)
        f_X_bb = 2.0 * slater_exchange_kernel(2.0 * dens_b, calculation.X_alpha)
    f_C_aa = f_C_ab = f_C_bb = jnp.zeros_like(dens_a)
    if functional.c_name is not None:
        f_C_aa, f_C_ab, f_C_bb = unrestricted_correlation_kernel(
            functional.c_name, dens_a, dens_b)
    log("[Done]", calculation, 1, silent=silent)

    log(" Calculating matrix elements...              ", calculation, 1, end="", silent=silent)
    T = jnp.einsum("imn,amn->iamn", mos[o], mos[v], optimize=True)
    alpha_occ = jnp.asarray(np.array(spin_labels)[o] == "a")
    beta_occ = jnp.asarray(np.array(spin_labels)[o] == "b")
    T_a = T * alpha_occ[:, None, None, None]
    T_b = T * beta_occ[:, None, None, None]

    K_X = (jnp.einsum("iamn,jbmn,mn->iajb", T_a, T_a, f_X_aa * w, optimize=True)
           + jnp.einsum("iamn,jbmn,mn->iajb", T_b, T_b, f_X_bb * w, optimize=True))
    K_C = (jnp.einsum("iamn,jbmn,mn->iajb", T_a, T_a, f_C_aa * w, optimize=True)
           + jnp.einsum("iamn,jbmn,mn->iajb", T_a, T_b, f_C_ab * w, optimize=True)
           + jnp.einsum("iamn,jbmn,mn->iajb", T_b, T_a, f_C_ab * w, optimize=True)
           + jnp.einsum("iamn,jbmn,mn->iajb", T_b, T_b, f_C_bb * w, optimize=True))
    K_XC = np.asarray(K_X * calculation.DFX_prop + K_C * calculation.DFC_prop)

    if not return_full_kernel:
        log("[Done]", calculation, 1, silent=silent)
        return K_XC

    alpha_virt = np.array(spin_labels)[v] == "a"
    beta_virt = np.array(spin_labels)[v] == "b"
    alpha_occ_np = np.asarray(alpha_occ)
    beta_occ_np = np.asarray(beta_occ)
    conserving = (alpha_occ_np[:, None] * alpha_virt[None, :]
                  + beta_occ_np[:, None] * beta_virt[None, :])
    K_XC = K_XC * conserving[:, :, None, None] * conserving[None, None, :, :]

    f_aa = w * (f_X_aa * calculation.DFX_prop + f_C_aa * calculation.DFC_prop)
    f_ab = w * f_C_ab * calculation.DFC_prop
    f_bb = w * (f_X_bb * calculation.DFX_prop + f_C_bb * calculation.DFC_prop)
    T_a_cons = T_a * jnp.asarray(alpha_virt)[None, :, None, None]
    T_b_cons = T_b * jnp.asarray(beta_virt)[None, :, None, None]

    labels = np.array(spin_labels)
    n_SO = mos.shape[0]
    K_XC_full = np.zeros((T.shape[0], T.shape[1], n_SO, n_SO))
    for spin, f_same, f_opp, T_same, T_opp in (
            ("a", f_aa, f_ab, T_a_cons, T_b_cons),
            ("b", f_bb, f_ab, T_b_cons, T_a_cons)):
        idx = np.where(labels == spin)[0]
        pair = jnp.einsum("pmn,qmn->pqmn", mos[idx], mos[idx], optimize=True)
        block = (jnp.einsum("iamn,pqmn,mn->iapq", T_same, pair, f_same, optimize=True)
                 + jnp.einsum("iamn,pqmn,mn->iapq", T_opp, pair, f_opp, optimize=True))
        K_XC_full[:, :, idx[:, None], idx[None, :]] = np.asarray(block)
    log("[Done]", calculation, 1, silent=silent)
    return K_XC, K_XC_full
