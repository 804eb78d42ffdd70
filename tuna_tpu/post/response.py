"""Orbital-rotation response matrices: the CIS/TDHF "A" (excitation) and "B"
(de-excitation) blocks and the orbital Hessian, shared by CIS/TDHF, SCF
stability analysis and the MP2 Z-vector (relaxed density) equations.

Conventions follow /root/reference/TUNA/tuna_ci.py:715-911, with integrals in
physicists' notation (spatial: plain <pq|rs>; spin-orbital: antisymmetrised
or response-scaled <pq||rs>).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..output import timer


def calculate_A_matrix(calculation, g, epsilons, o, v, K_XC=None,
                       matrix_type="singlet"):
    g = np.asarray(g)
    epsilons = np.asarray(epsilons)
    if calculation.reference == "RHF":
        if matrix_type == "singlet":
            A = 2 * g[o, o, v, v].transpose(0, 2, 1, 3) - g[o, v, o, v] * calculation.HFX_prop
        else:
            A = -g[o, v, o, v] * calculation.HFX_prop
    else:
        A = np.array(g[v, o, o, v].transpose(2, 0, 1, 3))

    if K_XC is not None:
        A = A + np.asarray(K_XC)

    A_ia_jb = A.reshape(A.shape[0] * A.shape[1], -1).copy()
    A_ia_jb[np.diag_indices_from(A_ia_jb)] += (
        epsilons[v][None, :] - epsilons[o][:, None]).ravel()
    return 0.5 * (A_ia_jb + A_ia_jb.T)


def calculate_B_matrix(calculation, g, o, v, K_XC=None, matrix_type="singlet"):
    g = np.asarray(g)
    if calculation.reference == "RHF":
        if matrix_type == "singlet":
            B = (2 * g[o, o, v, v].transpose(0, 2, 1, 3)
                 - g[o, o, v, v].transpose(0, 3, 1, 2) * calculation.HFX_prop)
        else:
            B = -g[o, o, v, v].transpose(0, 3, 1, 2) * calculation.HFX_prop
    else:
        B = g[v, v, o, o].transpose(2, 0, 3, 1)

    if K_XC is not None:
        B = B + np.asarray(K_XC)

    B_ia_jb = B.reshape(B.shape[0] * B.shape[1], -1)
    return 0.5 * (B_ia_jb + B_ia_jb.T)


def build_orbital_hessian(g, epsilons, o, v, calculation, hessian_type="singlet",
                          K_XC=None, spin_labels=None):
    """H = [[A, B], [B, A]]; spin-forbidden rotations screened out for UHF."""
    timer("Orbital Hessian construction", 0)
    if calculation.reference == "UHF":
        A = calculate_A_matrix(calculation, g, epsilons, o, v, K_XC)
        B = calculate_B_matrix(calculation, g, o, v, K_XC)
        spin_occupied = np.array(spin_labels)[o]
        spin_virtual = np.array(spin_labels)[v]
        spin_conserving = (spin_occupied[:, None] == spin_virtual[None, :]).ravel()
        A = A[spin_conserving][:, spin_conserving]
        B = B[spin_conserving][:, spin_conserving]
    else:
        A = calculate_A_matrix(calculation, g, epsilons, o, v, K_XC, hessian_type)
        B = calculate_B_matrix(calculation, g, o, v, K_XC, hessian_type)
    H = np.block([[A, B], [B, A]])
    H = 0.5 * (H + H.T)
    timer("Orbital Hessian construction", 1)
    return H
