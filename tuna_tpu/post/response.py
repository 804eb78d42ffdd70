"""Orbital-rotation response matrices: the CIS/TDHF "A" (excitation) and "B"
(de-excitation) blocks and the orbital Hessian, shared by CIS/TDHF/TDA, SCF
stability analysis and the MP2 Z-vector (relaxed density) equations.

Spatial-orbital (spin-adapted) blocks come in singlet / triplet flavours;
spin-orbital blocks take a pre-antisymmetrised (or response-scaled) tensor.
Built on device as 4-index tensors, then flattened to (ov x ov) matrices.
Capability parity: /root/reference/TUNA/tuna_ci.py:715-911.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..output import timer


def _flatten_symmetrise(M4, eps_diag=None):
    n_ov = M4.shape[0] * M4.shape[1]
    M = M4.reshape(n_ov, n_ov)
    if eps_diag is not None:
        M = M + jnp.diag(eps_diag.ravel())
    return 0.5 * (M + M.T)


def _orbital_gaps(epsilons, o, v):
    return epsilons[v][None, :] - epsilons[o][:, None]


def singlet_A(calculation, g, epsilons, o, v, K_XC=None):
    """Spin-adapted singlet excitation block: (ia|jb)-coupled."""
    g = jnp.asarray(g)
    A = 2.0 * g[o, o, v, v].transpose(0, 2, 1, 3) \
        - calculation.HFX_prop * g[o, v, o, v]
    if K_XC is not None:
        A = A + jnp.asarray(K_XC)
    return _flatten_symmetrise(A, _orbital_gaps(jnp.asarray(epsilons), o, v))


def triplet_A(calculation, g, epsilons, o, v, K_XC=None):
    g = jnp.asarray(g)
    A = -calculation.HFX_prop * g[o, v, o, v]
    if K_XC is not None:
        A = A + jnp.asarray(K_XC)
    return _flatten_symmetrise(A, _orbital_gaps(jnp.asarray(epsilons), o, v))


def singlet_B(calculation, g, o, v, K_XC=None):
    g = jnp.asarray(g)
    B = 2.0 * g[o, o, v, v].transpose(0, 2, 1, 3) \
        - calculation.HFX_prop * g[o, o, v, v].transpose(0, 3, 1, 2)
    if K_XC is not None:
        B = B + jnp.asarray(K_XC)
    return _flatten_symmetrise(B)


def triplet_B(calculation, g, o, v, K_XC=None):
    g = jnp.asarray(g)
    B = -calculation.HFX_prop * g[o, o, v, v].transpose(0, 3, 1, 2)
    if K_XC is not None:
        B = B + jnp.asarray(K_XC)
    return _flatten_symmetrise(B)


def spin_orbital_A(calculation, g, epsilons, o, v, K_XC=None):
    """Spin-orbital excitation block <aj||ib> reordered to (ia,jb)."""
    g = jnp.asarray(g)
    A = g[v, o, o, v].transpose(2, 0, 1, 3)
    if K_XC is not None:
        A = A + jnp.asarray(K_XC)
    return _flatten_symmetrise(A, _orbital_gaps(jnp.asarray(epsilons), o, v))


def spin_orbital_B(calculation, g, o, v, K_XC=None):
    g = jnp.asarray(g)
    B = g[v, v, o, o].transpose(2, 0, 3, 1)
    if K_XC is not None:
        B = B + jnp.asarray(K_XC)
    return _flatten_symmetrise(B)


def calculate_A_matrix(calculation, g, epsilons, o, v, K_XC=None,
                       matrix_type="singlet"):
    """Dispatching wrapper retained for generic callers."""
    if calculation.reference == "RHF":
        fn = singlet_A if matrix_type == "singlet" else triplet_A
        return fn(calculation, g, epsilons, o, v, K_XC)
    return spin_orbital_A(calculation, g, epsilons, o, v, K_XC)


def calculate_B_matrix(calculation, g, o, v, K_XC=None, matrix_type="singlet"):
    if calculation.reference == "RHF":
        fn = singlet_B if matrix_type == "singlet" else triplet_B
        return fn(calculation, g, o, v, K_XC)
    return spin_orbital_B(calculation, g, o, v, K_XC)


def build_orbital_hessian(g, epsilons, o, v, calculation, hessian_type="singlet",
                          K_XC=None, spin_labels=None):
    """H = [[A, B], [B, A]]; spin-forbidden rotations screened out for UHF."""
    timer("Orbital Hessian construction", 0)
    if calculation.reference == "UHF":
        A = np.asarray(spin_orbital_A(calculation, g, epsilons, o, v, K_XC))
        B = np.asarray(spin_orbital_B(calculation, g, o, v, K_XC))
        spin_occupied = np.array(spin_labels)[o]
        spin_virtual = np.array(spin_labels)[v]
        spin_conserving = (spin_occupied[:, None] == spin_virtual[None, :]).ravel()
        A = A[spin_conserving][:, spin_conserving]
        B = B[spin_conserving][:, spin_conserving]
    else:
        A = np.asarray(calculate_A_matrix(calculation, g, epsilons, o, v, K_XC,
                                          hessian_type))
        B = np.asarray(calculate_B_matrix(calculation, g, o, v, K_XC,
                                          hessian_type))
    H = np.block([[A, B], [B, A]])
    H = 0.5 * (H + H.T)
    timer("Orbital Hessian construction", 1)
    return H
