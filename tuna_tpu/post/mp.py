"""Moller-Plesset perturbation theory: MP2 (plus SCS / iterative / Laplace-AO /
orbital-optimised variants), MP3 and MP4, with unrelaxed and relaxed
densities.

Capability parity with /root/reference/TUNA/tuna_mp.py.  Hot contractions are
jitted jnp.einsum chains (lowered to dot_general on the MXU); the OMP2 and
IMP2 iterations run as host loops over jitted step functions since each step
re-transforms integrals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linalg
from ..output import error, log, log_spacer, timer
from ..scf.guess import natural_orbitals_of_density
from . import rpa, transforms


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _host_expm(M):
    """Matrix exponential on host: the TPU backend lacks the f64 LU solves
    inside the Pade algorithm, and these matrices are small."""
    import scipy.linalg
    return scipy.linalg.expm(np.asarray(M))


def print_natural_orbitals(P, X, S, calculation, silent=False):
    occupancies, orbitals = natural_orbitals_of_density(P, X, S)
    occupancies = np.asarray(occupancies)
    if calculation.method.name != "UHF":
        log("", calculation, 2, silent=silent)
    log("  Natural orbital occupancies: \n", calculation, 2, silent=silent)
    for i, occ in enumerate(occupancies):
        log(f"    {i + 1:2.0f}. {occ:12.8f}", calculation, 2, silent=silent)
    log(f"\n  Sum of natural orbital occupancies: {np.sum(occupancies):.6f}",
        calculation, 2, silent=silent)
    return occupancies, orbitals


def _t_amplitude_density_contribution(n, t_ijab, o, v):
    P = jnp.zeros((n, n))
    P = P.at[v, v].add(0.5 * jnp.einsum("ijac,ijbc->ab", t_ijab, t_ijab, optimize=True))
    P = P.at[o, o].add(-0.5 * jnp.einsum("jkab,ikab->ij", t_ijab, t_ijab, optimize=True))
    return P


def _spin_component_scaling_active(calculation):
    return ("SCS" in calculation.method.name
            or (calculation.DFT_calculation
                and calculation.functional.functional_type == "spin-scaled double-hybrid")
            or (calculation.DFT_calculation
                and (calculation.SSS_requested or calculation.OSS_requested)))


def _log_scs(calculation, silent):
    log(f"  Same-spin scaling: {calculation.same_spin_scaling:.3f}", calculation, 1, silent=silent)
    log(f"  Opposite-spin scaling: {calculation.opposite_spin_scaling:.3f}\n", calculation, 1, silent=silent)


# ---------------------------------------------------------------------------
# Relaxed (response) densities via Z-vector equations
# ---------------------------------------------------------------------------
# The orbital relaxation z solves ONE (A+B) system built by post.rpa; the
# occupied-virtual Lagrangian is assembled below as plain tensordots over the
# chemists' MO tensor (restricted) / antisymmetrised spin-orbital tensor
# (unrestricted).  Capability parity: tuna_mp.py:177-402, re-derived here in
# generalised-Fock form with the response solve on device.

def _frozen_core_rotation(P0, w, gc, epsilons, o, v, spin_adapted):
    """Frozen-active occupied rotation block: the Lagrangian coupling between
    frozen and active occupied orbitals over the orbital-energy gap.  gc is
    chemists' for the spin-adapted path, spin-orbital physicists' otherwise."""
    n_frozen = 0 if o.start is None else o.start
    if n_frozen == 0:
        return P0
    f = slice(0, n_frozen)
    if spin_adapted:
        # sum_jab w[i,j,a,b] (Fa|jb)  +  sum_jbc w[j,i,b,c] (jb|Fc)
        L_fo = (jnp.tensordot(gc[f, v, o, v], w, axes=((1, 2, 3), (2, 1, 3)))
                + jnp.tensordot(gc[o, v, f, v], w, axes=((0, 1, 3), (0, 2, 3))))
    else:
        # sum_jab w[i,j,a,b] <Fj|ab>
        L_fo = jnp.tensordot(gc[f, o, v, v], w, axes=((1, 2, 3), (1, 2, 3)))
    z_fo = L_fo / (epsilons[o][None, :] - epsilons[f][:, None])
    P0 = P0.at[f, o].add(0.5 * z_fo)
    P0 = P0.at[o, f].add(0.5 * z_fo.T)
    return P0


def _restricted_relaxed_density(P_unrelaxed, amp_weights, gc, epsilons, o, v,
                                n_occ, n_virt, calculation, K_XC, K_XC_full):
    """Spin-adapted Z-vector (response) MP2 density; gc is the full chemists'
    MO tensor, amp_weights the pre-scaled amplitude combinations."""
    gc = jnp.asarray(gc)
    w = jnp.asarray(amp_weights)
    epsilons = jnp.asarray(epsilons)
    oa = slice(0, n_occ)  # all occupied, frozen included

    # Amplitude part of the ov Lagrangian: two particle and two hole terms
    L_active = (jnp.tensordot(w, gc[v, v, o, v], axes=((1, 2, 3), (2, 1, 3)))
                + jnp.tensordot(w, gc[o, v, v, v], axes=((0, 2, 3), (0, 1, 3))))
    L_hole = (jnp.tensordot(w, gc[o, oa, o, v], axes=((0, 1, 3), (0, 2, 3)))
              + jnp.tensordot(w, gc[o, v, o, oa], axes=((0, 1, 2), (0, 2, 1))))
    L = jnp.zeros((n_occ, n_virt)).at[o, :].add(L_active) - L_hole.T

    P_relaxed = _frozen_core_rotation(jnp.asarray(P_unrelaxed), w, gc,
                                      epsilons, o, v, spin_adapted=True)

    # Generalised-Fock part, driven by the (frozen-corrected) density:
    # 4 J[P] - c_x (K[P] + K[P^T]) in the (i,a) block
    hfx = calculation.HFX_prop
    L_fock = 4.0 * jnp.tensordot(gc[v, oa, :, :], P_relaxed, axes=2).T
    L_fock = L_fock - hfx * (
        jnp.tensordot(gc[v, :, oa, :], P_relaxed, axes=((1, 3), (0, 1)))
        + jnp.tensordot(gc[v, :, oa, :], P_relaxed, axes=((1, 3), (1, 0)))).T
    if K_XC_full is not None:
        L_fock = L_fock + 2.0 * jnp.einsum("iapq,pq->ia", jnp.asarray(K_XC_full),
                                           P_relaxed, optimize=True)

    apb = rpa.restricted_apb(gc, epsilons, oa, v, hfx, "singlet", K_XC)
    z = rpa.zvector_solve(apb, L + L_fock)
    P_relaxed = P_relaxed.at[oa, v].add(0.5 * z)
    P_relaxed = P_relaxed.at[v, oa].add(0.5 * z.T)
    return P_relaxed


def _unrestricted_relaxed_density(P_unrelaxed, amp_weights, g, ERI_SO, epsilons,
                                  o, v, n_occ, n_virt, calculation, K_XC,
                                  K_XC_full):
    """Spin-orbital Z-vector MP2 density; g is the antisymmetrised
    physicists' tensor."""
    g = jnp.asarray(g)
    w = jnp.asarray(amp_weights)
    epsilons = jnp.asarray(epsilons)
    oa = slice(0, n_occ)

    L_active = jnp.tensordot(w, g[v, o, v, v], axes=((1, 2, 3), (1, 2, 3)))
    L_hole = jnp.tensordot(w, g[o, o, oa, v], axes=((0, 1, 3), (0, 1, 3)))
    L = jnp.zeros((n_occ, n_virt)).at[o, :].add(L_active) - L_hole.T

    P_relaxed = _frozen_core_rotation(jnp.asarray(P_unrelaxed), w, g,
                                      epsilons, o, v, spin_adapted=False)

    g_response = (jnp.asarray(ERI_SO)
                  - calculation.HFX_prop * jnp.asarray(ERI_SO).transpose(0, 1, 3, 2))
    L_fock = 2.0 * jnp.tensordot(g_response[v, :, oa, :], P_relaxed,
                                 axes=((1, 3), (0, 1))).T
    if K_XC_full is not None:
        L_fock = L_fock + 2.0 * jnp.einsum("iapq,pq->ia", jnp.asarray(K_XC_full),
                                           P_relaxed, optimize=True)

    apb = rpa.spin_orbital_apb(g_response, epsilons, oa, v, K_XC)
    z = rpa.zvector_solve(apb, L + L_fock)
    P_relaxed = P_relaxed.at[oa, v].add(0.5 * z)
    P_relaxed = P_relaxed.at[v, oa].add(0.5 * z.T)
    return P_relaxed


# ---------------------------------------------------------------------------
# Restricted MP2
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_occ",))
def _restricted_mp2_core(g_iajb, e_ijab, n_occ):
    """Jitted MP2 energies and unrelaxed density blocks (one executable)."""
    g_ijab = g_iajb
    g_asym = g_ijab - g_ijab.swapaxes(2, 3)
    E_OS = jnp.einsum("ijab,ijab,ijab->", g_ijab, g_ijab, e_ijab, optimize=True)
    E_SS = jnp.einsum("ijab,ijab,ijab->", g_ijab, g_asym, e_ijab, optimize=True)
    t_OS = -2.0 * g_ijab * e_ijab
    t_SS = g_asym * e_ijab
    oo_OS = -0.5 * jnp.einsum("kiab,kjab->ij", t_OS, t_OS, optimize=True)
    vv_OS = 0.5 * jnp.einsum("ijbc,ijac->ab", t_OS, t_OS, optimize=True)
    oo_SS = -jnp.einsum("kiab,kjab->ij", t_SS, t_SS, optimize=True)
    vv_SS = jnp.einsum("ijbc,ijac->ab", t_SS, t_SS, optimize=True)
    return E_OS, E_SS, oo_OS, vv_OS, oo_SS, vv_SS


def run_restricted_MP2(ERI_MO, epsilons, molecular_orbitals, o, v, X, calculation,
                       molecule, S=None, silent=False, K_XC=None, K_XC_full=None):
    natural_occ, naturals = None, None
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)

    same_spin_scale = opposite_spin_scale = 1.0
    do_scs = _spin_component_scaling_active(calculation)

    log_spacer(calculation, silent=silent, start="\n")
    log("                MP2 Energy and Density ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log("  Calculating MP2 correlation energy... ", calculation, 1, end="", silent=silent)

    ERI_phys = transforms.chemists_to_physicists(ERI_MO)
    E_OS_j, E_SS_j, oo_OS, vv_OS, oo_SS, vv_SS = _restricted_mp2_core(
        ERI_phys[o, o, v, v], e_ijab, molecule.n_doubly_occ)
    E_MP2_OS, E_MP2_SS = float(E_OS_j), float(E_SS_j)
    log("     [Done]\n", calculation, 1, silent=silent)

    if do_scs:
        _log_scs(calculation, silent)
        E_MP2_SS *= calculation.same_spin_scaling
        E_MP2_OS *= calculation.opposite_spin_scaling
        same_spin_scale = calculation.same_spin_scaling
        opposite_spin_scale = calculation.opposite_spin_scaling

    E_MP2 = E_MP2_SS + E_MP2_OS
    log(f"  Same spin contribution:             {E_MP2_SS:13.10f}", calculation, 1, silent=silent)
    log(f"  Opposite spin contribution:         {E_MP2_OS:13.10f}", calculation, 1, silent=silent)
    log(f"\n  MP2 correlation energy:             {E_MP2:13.10f}", calculation, 1, silent=silent)

    label = "relaxed" if calculation.relaxed_density else "unrelaxed"
    log(f"\n  Constructing MP2 {label} density... ".ljust(41), calculation, 1, end="", silent=silent)

    n_basis = molecule.n_basis
    P_OS = jnp.zeros((n_basis, n_basis)).at[o, o].add(oo_OS).at[v, v].add(vv_OS)
    P_SS = jnp.zeros((n_basis, n_basis)).at[o, o].add(oo_SS).at[v, v].add(vv_SS)

    if calculation.relaxed_density:
        g_ijab = ERI_phys[o, o, v, v]
        w_OS = 2.0 * g_ijab * e_ijab
        w_SS = 2.0 * (g_ijab - g_ijab.swapaxes(2, 3)) * e_ijab
        n_virt = n_basis - molecule.n_doubly_occ
        epsilons = jnp.asarray(epsilons)
        P_OS = _restricted_relaxed_density(P_OS, w_OS, ERI_MO, epsilons, o, v,
                                           molecule.n_doubly_occ, n_virt,
                                           calculation, K_XC, K_XC_full)
        P_SS = _restricted_relaxed_density(P_SS, w_SS, ERI_MO, epsilons, o, v,
                                           molecule.n_doubly_occ, n_virt,
                                           calculation, K_XC, K_XC_full)

    double_hybrid_scale = (calculation.MPC_prop
                           if calculation.MPC_requested or calculation.DFT_calculation else 1.0)

    P_MO = jnp.zeros((n_basis, n_basis))
    P_MO = P_MO.at[:molecule.n_doubly_occ, :molecule.n_doubly_occ].set(
        2.0 * jnp.eye(molecule.n_doubly_occ))
    P_MO = P_MO + (opposite_spin_scale * jnp.asarray(P_OS)
                   + same_spin_scale * jnp.asarray(P_SS)) * double_hybrid_scale

    C = jnp.asarray(molecular_orbitals)
    P = C @ P_MO @ C.T
    P_alpha = P_beta = P / 2.0
    log("     [Done]", calculation, 1, silent=silent)

    if calculation.natural_orbitals:
        natural_occ, naturals = print_natural_orbitals(P, X, S, calculation, silent)

    return E_MP2, P, P_alpha, P_beta, natural_occ, naturals


# ---------------------------------------------------------------------------
# Unrestricted MP2
# ---------------------------------------------------------------------------

def run_unrestricted_MP2(molecule, calculation, SCF_output, n_SO, o,
                         ERI_spin_block, X, silent=False, g=None, ERI_SO=None,
                         epsilons_sorted=None, C_spin_block=None, spin_labels=None,
                         K_XC=None, K_XC_full=None):
    natural_occ, naturals = None, None

    C_a = jnp.asarray(SCF_output.molecular_orbitals_alpha)
    C_b = jnp.asarray(SCF_output.molecular_orbitals_beta)
    eps_a = jnp.sort(jnp.asarray(SCF_output.epsilons_alpha))
    eps_b = jnp.sort(jnp.asarray(SCF_output.epsilons_beta))
    n_occ_a, n_occ_b = molecule.n_alpha, molecule.n_beta

    o_a = slice((o.start + 1) // 2, n_occ_a)
    o_b = slice(o.start // 2, n_occ_b)
    v_a = slice(n_occ_a, n_SO // 2)
    v_b = slice(n_occ_b, n_SO // 2)

    do_scs = _spin_component_scaling_active(calculation)
    same_spin_scale = opposite_spin_scale = 1.0

    log_spacer(calculation, silent=silent, start="\n")
    log("                MP2 Energy and Density ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    # Separate alpha/beta spatial transforms (the physicists' convention of
    # transform_ERI_AO_to_SO applied with pure-spin orbital sets)
    C_sb_a = transforms.spin_block_orbitals(C_a, C_a, np.asarray(SCF_output.epsilons_alpha))
    C_sb_b = transforms.spin_block_orbitals(C_b, C_b, np.asarray(SCF_output.epsilons_beta))

    ERI_SO_a = transforms.ao_to_so_physicists(ERI_spin_block, C_sb_a, C_sb_a)
    ERI_SO_b = transforms.ao_to_so_physicists(ERI_spin_block, C_sb_b, C_sb_b)
    ERI_SO_ab = transforms.ao_to_so_physicists(ERI_spin_block, C_sb_b, C_sb_a)

    g_a = transforms.antisymmetrise(ERI_SO_a)
    g_b = transforms.antisymmetrise(ERI_SO_b)

    log("  Calculating MP2 correlation energy... ", calculation, 1, end="", silent=silent)

    g_aa = g_a[o_a, o_a, v_a, v_a]
    g_bb = g_b[o_b, o_b, v_b, v_b]
    g_ab = ERI_SO_ab[o_a, o_b, v_a, v_b]

    e_aa = transforms.doubles_epsilons(eps_a, eps_a, o_a, o_a, v_a, v_a)
    e_bb = transforms.doubles_epsilons(eps_b, eps_b, o_b, o_b, v_b, v_b)
    e_ab = transforms.doubles_epsilons(eps_a, eps_b, o_a, o_b, v_a, v_b)

    t_aa = g_aa * e_aa
    t_bb = g_bb * e_bb
    t_ab = g_ab * e_ab
    t_ba = t_ab.transpose(1, 0, 3, 2)

    E_aa = 0.25 * float(jnp.einsum("ijab,ijab->", t_aa, g_aa, optimize=True))
    E_bb = 0.25 * float(jnp.einsum("ijab,ijab->", t_bb, g_bb, optimize=True))
    E_ab = float(jnp.einsum("ijab,ijab->", t_ab, g_ab, optimize=True))

    E_MP2_SS = E_aa + E_bb
    E_MP2_OS = E_ab
    log("     [Done]\n", calculation, 1, silent=silent)

    if do_scs:
        _log_scs(calculation, silent)
        E_MP2_SS *= calculation.same_spin_scaling
        E_MP2_OS *= calculation.opposite_spin_scaling
        same_spin_scale = calculation.same_spin_scaling
        opposite_spin_scale = calculation.opposite_spin_scaling

    E_MP2 = E_MP2_SS + E_MP2_OS
    log(f"  Energy from alpha-alpha pairs:      {E_aa:13.10f}", calculation, 1, silent=silent)
    log(f"  Energy from beta-beta pairs:        {E_bb:13.10f}", calculation, 1, silent=silent)
    log(f"  Energy from alpha-beta pairs:       {E_ab:13.10f}", calculation, 1, silent=silent)
    log(f"\n  Same spin contribution:             {E_MP2_SS:13.10f}", calculation, 1, silent=silent)
    log(f"  Opposite spin contribution:         {E_MP2_OS:13.10f}", calculation, 1, silent=silent)
    log(f"\n  MP2 correlation energy:             {E_MP2:13.10f}", calculation, 1, silent=silent)

    label = "relaxed" if calculation.relaxed_density else "unrelaxed"
    log(f"\n  Constructing MP2 {label} density... ".ljust(41), calculation, 1, end="", silent=silent)

    n = n_SO // 2
    P_a_MO = jnp.zeros((n, n)).at[:n_occ_a, :n_occ_a].set(jnp.eye(n_occ_a))
    P_b_MO = jnp.zeros((n, n)).at[:n_occ_b, :n_occ_b].set(jnp.eye(n_occ_b))

    P_aa = _t_amplitude_density_contribution(n, t_aa, o_a, v_a)
    P_ab = _t_amplitude_density_contribution(n, t_ab, o_a, v_a)
    P_bb = _t_amplitude_density_contribution(n, t_bb, o_b, v_b)
    P_ba = _t_amplitude_density_contribution(n, t_ba, o_b, v_b)

    double_hybrid_scale = (calculation.MPC_prop
                           if calculation.MPC_requested or calculation.DFT_calculation else 1.0)

    P_a_MO = P_a_MO + (same_spin_scale * P_aa + opposite_spin_scale * 2 * P_ab) * double_hybrid_scale
    P_b_MO = P_b_MO + (same_spin_scale * P_bb + opposite_spin_scale * 2 * P_ba) * double_hybrid_scale

    P_alpha = C_a @ P_a_MO @ C_a.T
    P_beta = C_b @ P_b_MO @ C_b.T
    P = P_alpha + P_beta

    if calculation.relaxed_density:
        v_full = slice(molecule.n_occ, None)
        n_occ, n_virt = molecule.n_occ, n_SO - molecule.n_occ
        e_ijab = transforms.doubles_epsilons(epsilons_sorted, epsilons_sorted, o, o, v_full, v_full)
        t_ijab = g[o, o, v_full, v_full] * e_ijab
        spins_occupied = np.array(spin_labels)[o]
        pair_scaling = np.where(spins_occupied[:, None] == spins_occupied[None, :],
                                same_spin_scale, opposite_spin_scale)
        w_ijab = t_ijab * pair_scaling[:, :, None, None] * double_hybrid_scale

        P_SO = np.zeros((n_SO, n_SO))
        P_SO[o, o] -= 0.5 * np.einsum("jkab,ikab->ij", np.asarray(w_ijab), np.asarray(t_ijab), optimize=True)
        P_SO[v_full, v_full] += 0.5 * np.einsum("ijac,ijbc->ab", np.asarray(w_ijab), np.asarray(t_ijab), optimize=True)
        P_SO = _unrestricted_relaxed_density(P_SO, w_ijab, g, ERI_SO, epsilons_sorted,
                                             o, v_full, n_occ, n_virt, calculation,
                                             K_XC, K_XC_full)
        P_SO[:n_occ, :n_occ] += np.eye(n_occ)
        P, P_alpha, P_beta = transforms.density_so_to_ao(jnp.asarray(P_SO), C_spin_block, n_SO)

    log("     [Done]", calculation, 1, silent=silent)

    if calculation.natural_orbitals:
        natural_occ, naturals = print_natural_orbitals(P, X, SCF_output.S, calculation, silent)

    return E_MP2, P, P_alpha, P_beta, natural_occ, naturals


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_occ",))
def _restricted_mp3_core(g, e_ijab, n_occ):
    """Jitted MP3: amplitudes, multipliers and the third-order energy."""
    n = g.shape[0]
    o = slice(None, n_occ)
    v = slice(n_occ, None)
    L = 2 * g - g.transpose(0, 3, 2, 1)
    t_ijab = jnp.einsum("ijab,aibj->ijab", e_ijab, g[v, o, v, o], optimize=True)
    t_dash_ijab = 2 * jnp.einsum("ijab,iajb->ijab", e_ijab, L[o, v, o, v], optimize=True)
    X_ijab = (0.5 * jnp.einsum("ijcd,acbd->ijab", t_ijab, g[v, v, v, v], optimize=True)
              + 0.5 * jnp.einsum("klab,kilj->ijab", t_ijab, g[o, o, o, o], optimize=True))
    X_ijab += (jnp.einsum("ikac,bjkc->ijab", t_ijab, L[v, o, o, v], optimize=True)
               - jnp.einsum("kjac,bcki->ijab", t_ijab, g[v, v, o, o], optimize=True)
               - jnp.einsum("kiac,bjkc->ijab", t_ijab, g[v, o, o, v], optimize=True))
    E_MP3 = jnp.einsum("ijab,ijab->", t_dash_ijab, X_ijab, optimize=True)
    return E_MP3, e_ijab, t_ijab, t_dash_ijab, L


def run_restricted_MP3(calculation, ERI_MO, epsilons, E_MP2, o, v, silent=False):
    log_spacer(calculation, silent=silent, start="\n")
    log("                      MP3 Energy  ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log("  Calculating amplitudes and multipliers...  ", calculation, 1, end="", silent=silent)

    g = ERI_MO  # chemists' notation throughout (Helgaker convention)
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    E_MP3_j, e_ijab, t_ijab, t_dash_ijab, L = _restricted_mp3_core(g, e_ijab,
                                                                   o.stop - (o.start or 0))
    log("[Done]", calculation, 1, silent=silent)
    log("  Calculating MP3 correlation energy...      ", calculation, 1, end="", silent=silent)
    E_MP3 = float(E_MP3_j)
    log(f"[Done]\n\n  MP3 correlation energy:             {E_MP3:13.10f}",
        calculation, 1, silent=silent)

    if calculation.method.name == "SCS-MP3":
        E_MP3 *= calculation.MP3_scaling
        log(f"\n  Scaling for MP3: {calculation.MP3_scaling:.3f}\n", calculation, 1, silent=silent)
        log(f"  Scaled MP3 correlation energy:    {E_MP3:15.10f}", calculation, 1, silent=silent)
        log(f"  SCS-MP3 correlation energy:       {(E_MP3 + E_MP2):15.10f}", calculation, 1, silent=silent)

    return E_MP3, e_ijab, t_ijab, t_dash_ijab, L


def run_unrestricted_MP3(calculation, g, epsilons_sorted, E_MP2, o, v, silent=False):
    log_spacer(calculation, silent=silent, start="\n")
    log("                      MP3 Energy  ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    e_ijab = transforms.doubles_epsilons(epsilons_sorted, epsilons_sorted, o, o, v, v)
    log("  Calculating MP3 correlation energy...      ", calculation, 1, end="", silent=silent)

    E_MP3 = 0.125 * float(jnp.einsum(
        "ijab,klij,abkl,ijab,klab->", g[o, o, v, v], g[o, o, o, o], g[v, v, o, o],
        e_ijab, e_ijab, optimize=True))
    E_MP3 += 0.125 * float(jnp.einsum(
        "ijab,abcd,cdij,ijab,ijcd->", g[o, o, v, v], g[v, v, v, v], g[v, v, o, o],
        e_ijab, e_ijab, optimize=True))
    E_MP3 += float(jnp.einsum(
        "ijab,kbcj,acik,ijab,ikac->", g[o, o, v, v], g[o, v, v, o], g[v, v, o, o],
        e_ijab, e_ijab, optimize=True))

    log(f"[Done]\n\n  MP3 correlation energy:             {E_MP3:13.10f}",
        calculation, 1, silent=silent)

    if calculation.method.name == "SCS-MP3":
        E_MP3 *= calculation.MP3_scaling
        log(f"\n  Scaling for MP3: {calculation.MP3_scaling:.3f}\n", calculation, 1, silent=silent)
        log(f"  Scaled MP3 correlation energy:    {E_MP3:15.10f}", calculation, 1, silent=silent)
        log(f"  SCS-MP3 correlation energy:       {(E_MP3 + E_MP2):15.10f}", calculation, 1, silent=silent)

    return E_MP3


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------

def _permute_symmetric(array, pair1, pair2):
    return array + array.swapaxes(*pair1).swapaxes(*pair2)


def _permute_three_columns(array):
    out = (array + array.transpose(0, 2, 1, 3, 5, 4) + array.transpose(1, 0, 2, 4, 3, 5)
           + array.transpose(1, 2, 0, 4, 5, 3) + array.transpose(2, 0, 1, 5, 3, 4)
           + array.transpose(2, 1, 0, 5, 4, 3))
    return out


def second_order_triples_amplitudes(e_ijkabc, t_ijab, g, o, v):
    """Second-order restricted triples amplitudes, used by MP4 and CC3."""
    t = jnp.einsum("ijad,ckbd->ijkabc", t_ijab, g[v, o, v, v], optimize=True)
    t -= jnp.einsum("ilab,cklj->ijkabc", t_ijab, g[v, o, o, o], optimize=True)
    return _permute_three_columns(t) * e_ijkabc


@partial(jax.jit, static_argnames=("n_occ", "with_singles", "with_triples"))
def _restricted_mp4_core(g, e_ijab, t_ijab, t_dash_ijab, L, epsilons, n_occ,
                         with_singles, with_triples):
    """Jitted fourth-order energy components (S, D, T, Q channels)."""
    o = slice(None, n_occ)
    v = slice(n_occ, None)
    zero = jnp.zeros(())

    second_t2 = (-jnp.einsum("ijcd,acbd->ijab", t_ijab, g[v, v, v, v], optimize=True)
                 - jnp.einsum("klab,kilj->ijab", t_ijab, g[o, o, o, o], optimize=True))
    inner = (jnp.einsum("ikac,bjkc->ijkabc", t_ijab, L[v, o, o, v], optimize=True)
             - jnp.einsum("kjac,bcki->ijkabc", t_ijab, g[v, v, o, o], optimize=True)
             - jnp.einsum("kiac,bjkc->ijkabc", t_ijab, g[v, o, o, v], optimize=True))
    second_t2 += -_permute_symmetric(jnp.einsum("ijkabc->ijab", inner, optimize=True),
                                     (0, 1), (2, 3))
    second_t2 = -second_t2 * e_ijab

    E_S = zero
    if with_singles:
        e_ia = transforms.singles_epsilons(epsilons, o, v)
        second_t1 = (jnp.einsum("klad,kild->ia", t_ijab, L[o, o, o, v], optimize=True)
                     - jnp.einsum("kicd,adkc->ia", t_ijab, L[v, v, o, v], optimize=True))
        second_t1 = -second_t1 * e_ia
        S_channel = (jnp.einsum("jc,aibc->ijab", second_t1, g[v, o, v, v], optimize=True)
                     - jnp.einsum("kb,aikj->ijab", second_t1, g[v, o, o, o], optimize=True))
        E_S = jnp.einsum("ijab,ijab->", t_dash_ijab, S_channel, optimize=True)

    D_channel = (0.5 * jnp.einsum("ijcd,acbd->ijab", second_t2, g[v, v, v, v], optimize=True)
                 + 0.5 * jnp.einsum("klab,kilj->ijab", second_t2, g[o, o, o, o], optimize=True))
    D_channel += (jnp.einsum("ikac,bjkc->ijab", second_t2, L[v, o, o, v], optimize=True)
                  - jnp.einsum("kjac,bcki->ijab", second_t2, g[v, v, o, o], optimize=True)
                  - jnp.einsum("kiac,bjkc->ijab", second_t2, g[v, o, o, v], optimize=True))
    E_D = jnp.einsum("ijab,ijab->", t_dash_ijab, D_channel, optimize=True)

    E_T = zero
    if with_triples:
        e_ijkabc = transforms.triples_epsilons(epsilons, o, v)
        second_t3 = second_order_triples_amplitudes(e_ijkabc, t_ijab, g, o, v)
        T_channel = (jnp.einsum("ijkacd,bckd->ijab", second_t3, L[v, v, o, v], optimize=True)
                     - jnp.einsum("kjiacd,kdbc->ijab", second_t3, g[o, v, v, v], optimize=True))
        T_channel += (-jnp.einsum("iklabc,kjlc->ijab", second_t3, L[o, o, o, v], optimize=True)
                      + jnp.einsum("lkiabc,kjlc->ijab", second_t3, g[o, o, o, v], optimize=True))
        E_T = jnp.einsum("ijab,ijab->", t_dash_ijab, T_channel, optimize=True)

    Q_channel = 0.5 * jnp.einsum("klab,ijkl->ijab", t_ijab,
                                 jnp.einsum("ijcd,kcld->ijkl", t_ijab, g[o, v, o, v], optimize=True), optimize=True)
    Q_channel += jnp.einsum("ikac,jkbc->ijab", t_ijab,
                            jnp.einsum("jlbd,kcld->jkbc", t_ijab - t_ijab.swapaxes(0, 1), L[o, v, o, v], optimize=True), optimize=True)
    Q_channel += 0.5 * jnp.einsum("kiac,jkbc->ijab", t_ijab,
                                  jnp.einsum("ljbd,kcld->jkbc", t_ijab, g[o, v, o, v], optimize=True), optimize=True)
    Q_channel += 0.5 * jnp.einsum("kjad,ikbd->ijab", t_ijab,
                                  jnp.einsum("libc,kcld->ikbd", t_ijab, g[o, v, o, v], optimize=True), optimize=True)
    Q_channel += -jnp.einsum("ikab,jk->ijab", t_ijab,
                             jnp.einsum("ljcd,lckd->jk", t_ijab, L[o, v, o, v], optimize=True), optimize=True)
    Q_channel += -jnp.einsum("ijac,bc->ijab", t_ijab,
                             jnp.einsum("klbd,kcld->bc", t_ijab, L[o, v, o, v], optimize=True), optimize=True)
    E_Q = jnp.einsum("ijab,ijab->", t_dash_ijab, Q_channel, optimize=True)
    return E_S, E_D, E_T, E_Q


def run_restricted_MP4(e_ijab, t_ijab, t_dash_ijab, L, ERI_MO, epsilons, o, v,
                       calculation, silent=False):
    name = calculation.method.name

    log_spacer(calculation, silent=silent, start="\n")
    log("                      MP4 Energy  ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log("  Calculating amplitudes and multipliers...  ", calculation, 1, end="", silent=silent)
    log("[Done]", calculation, 1, silent=silent)
    log("  Calculating MP4 correlation energy...      ", calculation, 1, end="", silent=silent)

    with_singles = name not in ("MP4[DQ]", "MP4(DQ)")
    with_triples = name in ("MP4", "MP4[SDTQ]", "MP4(SDTQ)")
    E_S, E_D, E_T, E_Q = _restricted_mp4_core(
        jnp.asarray(ERI_MO), e_ijab, t_ijab, t_dash_ijab, L,
        jnp.asarray(epsilons), o.stop - (o.start or 0), with_singles, with_triples)
    E_MP4_S, E_MP4_D, E_MP4_T, E_MP4_Q = (float(E_S), float(E_D), float(E_T), float(E_Q))
    E_MP4 = E_MP4_S + E_MP4_D + E_MP4_T + E_MP4_Q
    log("[Done]\n", calculation, 1, silent=silent)

    if name in ("MP4[SDQ]", "MP4(SDQ)"):
        log("  Triples are not included in MP4(SDQ).\n", calculation, 1, silent=silent)
    elif name in ("MP4[DQ]", "MP4(DQ)"):
        log("  Singles and triples are not included in MP4(DQ).\n", calculation, 1, silent=silent)
    else:
        log("  Triples are included in full MP4.\n", calculation, 1, silent=silent)

    log(f"  Singles correlation energy:         {E_MP4_S:13.10f}", calculation, 2, silent=silent)
    log(f"  Doubles correlation energy:         {E_MP4_D:13.10f}", calculation, 2, silent=silent)
    log(f"  Triples correlation energy:         {E_MP4_T:13.10f}", calculation, 2, silent=silent)
    log(f"  Quadruples correlation energy:      {E_MP4_Q:13.10f}", calculation, 2, silent=silent)
    log(f"\n  MP4 correlation energy:             {E_MP4:13.10f}", calculation, 1, silent=silent)
    return E_MP4


# ---------------------------------------------------------------------------
# Laplace-transform AO-MP2
# ---------------------------------------------------------------------------

def run_restricted_laplace_MP2(integrals, F, calculation, P, silent=False):
    """Euler-Maclaurin-B Laplace AO-MP2 (tuna_mp.py:576-677)."""
    import jax.scipy.linalg as jsl

    P = jnp.asarray(P) / 2.0
    log_spacer(calculation, silent=silent, start="\n")
    log("          Laplace Transform AO-MP2 Energy", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    log("  Constructing hole density matrix...        ", calculation, 1, end="", silent=silent)
    _, _, S_inverse = linalg.inverse_sqrt(jnp.asarray(integrals.S))
    Q = S_inverse - P
    log("[Done]", calculation, 1, silent=silent)

    tau = calculation.num_laplace_points
    pad = "" if tau > 9 else " "
    log(f"\n  Building {tau} point integration grid...      {pad}", calculation, 1,
        end="", silent=silent)

    k = np.arange(1, tau + 1)
    r = k / (tau + 1)
    s = (r**3 - 0.9 * r**4) / (1 - r) ** 2 + r**2 * np.tan(np.pi * r / 2)
    ds_dr = -r / (1 - r) ** 3 * (
        r * (-1.8 * r**2 + 4.6 * r - 3)
        + 2 * (r - 1) ** 3 * np.tan(np.pi * r / 2)
        + np.pi / 2 * r * (r - 1) ** 3 * (1 / np.cos(np.pi * r / 2) ** 2))

    ERI = jnp.asarray(integrals.ERI_AO)
    L_AO = 2 * ERI - ERI.swapaxes(1, 3)
    log("[Done]", calculation, 1, silent=silent)

    F = jnp.asarray(F)
    total = 0.0
    for i in range(len(s)):
        log(f"\n   ~~~~~ Grid Point {i + 1} of {len(s)}  ~~~~~ ", calculation, 1, silent=silent)
        log("\n   Building energy-weighted densities...     ", calculation, 1, end="", silent=silent)
        Xm = jnp.asarray(_host_expm(s[i] * P @ F)) @ P
        Ym = jnp.asarray(_host_expm(-s[i] * Q @ F)) @ Q
        log("[Done]", calculation, 1, silent=silent)
        log("   Calculating energy components...          ", calculation, 1, end="", silent=silent)
        L1 = jnp.tensordot(Xm, L_AO, axes=([0], [0]))
        L2 = jnp.tensordot(Ym, L1, axes=([0], [1]))
        L3 = jnp.tensordot(Xm, L2, axes=([1], [2]))
        L4 = jnp.tensordot(Ym, L3, axes=([1], [3]))
        e = float(jnp.tensordot(L4, ERI, axes=([0, 1, 2, 3], [3, 2, 1, 0])))
        log("[Done]", calculation, 1, silent=silent)
        total += e * ds_dr[i]

    log("\n  Integrating MP2 energy...                  ", calculation, 1, end="", silent=silent)
    E_MP2 = -total / (tau + 1)
    log("[Done]", calculation, 1, silent=silent)
    log(f"\n  MP2 correlation energy:           {E_MP2:15.10f}", calculation, 1, silent=silent)
    return E_MP2


# ---------------------------------------------------------------------------
# Iterative (Hylleraas) MP2
# ---------------------------------------------------------------------------

def run_iterative_restricted_MP2(ERI_MO, epsilons, molecular_orbitals, o, v,
                                 n_doubly_occ, X, integrals, calculation,
                                 SCF_output, silent=False):
    from ..scf import coulomb_matrix, density_matrix, diagonalise_fock, exchange_matrix, symmetrise

    g = transforms.chemists_to_physicists(ERI_MO)

    C = jnp.asarray(molecular_orbitals)
    P_AO = density_matrix(C, n_doubly_occ, 2)
    H = integrals.H_core
    F_AO = symmetrise(H + integrals.G + coulomb_matrix(P_AO, integrals.ERI_AO)
                      - 0.5 * exchange_matrix(P_AO, integrals.ERI_AO))

    S_MO = C.T @ jnp.asarray(SCF_output.S) @ C
    F_MO = C.T @ F_AO @ C
    epsilons, _ = diagonalise_fock(F_AO, X)
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)

    E_conv = calculation.energy_convergence
    max_iter = int(calculation.correlated_max_iter)

    log_spacer(calculation, silent=silent, start="\n")
    log("           Iterative MP2 Energy and Density ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log(f"\n  Tolerance for energy convergence:    {E_conv:.10f}", calculation, 1, silent=silent)
    log("\n  Starting MP2 iterations...\n", calculation, 1, end="", silent=silent)
    log_spacer(calculation, silent=silent, start="\n")
    log("  Step          Correlation E               DE", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    g_oovv = g[o, o, v, v]
    Fvv, Foo, Svv = F_MO[v, v], F_MO[o, o], S_MO[v, v]

    @partial(jax.jit, static_argnames=("n_steps",))
    def imp2_solve(g_oovv, Fvv, Foo, Svv, e_ijab, n_steps):
        def body(carry):
            step, E, t_ijab, conv, stats = carry
            R = g_oovv + jnp.einsum("ap,ijpq,qb->ijab", Fvv, t_ijab, Svv, optimize=True)
            R += jnp.einsum("ap,ijpq,qb->ijab", Svv, t_ijab, Fvv, optimize=True)
            R += -jnp.einsum("ap,ik,kjpq,qb->ijab", Svv, Foo, t_ijab, Svv, optimize=True)
            R += -jnp.einsum("ap,kj,ikpq,qb->ijab", Svv, Foo, t_ijab, Svv, optimize=True)
            t_new = t_ijab + R * e_ijab
            E_new = 0.5 * jnp.sum(jnp.einsum(
                "ijab,ijab->ij", g_oovv + R,
                4 * t_new - 2 * t_new.swapaxes(0, 1), optimize=True))
            dE = jnp.abs(E_new - E)
            stats = stats.at[step - 1].set(jnp.stack([E_new, dE]))
            return step + 1, E_new, t_new, dE < E_conv, stats

        def cond(carry):
            return (carry[0] <= n_steps) & ~carry[3]

        stats0 = jnp.zeros((n_steps, 2), dtype=g_oovv.dtype)
        carry0 = (jnp.asarray(1), jnp.asarray(0.0, dtype=g_oovv.dtype),
                  jnp.zeros_like(g_oovv), jnp.asarray(False), stats0)
        step, E, t_ijab, conv, stats = jax.lax.while_loop(cond, body, carry0)
        return step - 1, E, t_ijab, conv, stats

    n_steps, E_j, t_ijab, converged, stats = imp2_solve(g_oovv, Fvv, Foo, Svv,
                                                        e_ijab, max_iter)
    n_steps = int(n_steps)
    stats = np.asarray(stats)
    for i in range(n_steps):
        log(f"  {i + 1:3.0f}           {stats[i, 0]:13.10f}         {stats[i, 1]:13.10f}",
            calculation, 1, silent=silent)
    if not bool(converged):
        error("Iterative MP2 failed to converge! Try increasing the maximum iterations?")
    E_MP2 = float(E_j)

    log_spacer(calculation, silent=silent)
    log(f"\n  MP2 correlation energy:             {E_MP2:.10f}", calculation, 1, silent=silent)
    log("\n  Constructing MP2 unrelaxed density...", calculation, 1, end="", silent=silent)

    n = F_MO.shape[0]
    P_MO = jnp.zeros((n, n)).at[:n_doubly_occ, :n_doubly_occ].set(2 * jnp.eye(n_doubly_occ))
    P_MO = P_MO.at[o, o].add(-2 * jnp.einsum("ikab,kjab->ij", t_ijab, t_ijab, optimize=True))
    P_MO = P_MO.at[v, v].add(2 * jnp.einsum("ijac,ijcb->ab", t_ijab, t_ijab, optimize=True))
    P = C @ P_MO @ C.T
    P_alpha = P_beta = P / 2
    log("      [Done]", calculation, 1, silent=silent)

    natural_occ, naturals = (print_natural_orbitals(P, X, SCF_output.S, calculation, silent)
                             if calculation.natural_orbitals else (None, None))
    return E_MP2, P, P_alpha, P_beta, natural_occ, naturals


# ---------------------------------------------------------------------------
# Orbital-optimised MP2
# ---------------------------------------------------------------------------

def run_orbital_optimised_MP2(molecule, calculation, g, C_spin_block, H_core, V_NN,
                              n_SO, X, E_HF, ERI_spin_block, o, v, silent=False):
    n_occ = molecule.n_occ

    log_spacer(calculation, silent=silent, start="\n")
    log("      Orbital-optimised MP2 Energy and Density ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log(f"\n  Tolerance for energy convergence:    {calculation.energy_convergence:.10f}",
        calculation, 1, silent=silent)
    log("\n  Starting orbital-optimised MP2 iterations...\n", calculation, 1, end="", silent=silent)
    log_spacer(calculation, silent=silent, start="\n")
    log("  Step          Correlation E               DE", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    n = jnp.newaxis
    H_core_sb = transforms.spin_block_matrix(jnp.asarray(H_core))
    P_ref = jnp.zeros((n_SO, n_SO)).at[:n_occ, :n_occ].set(jnp.eye(n_occ))
    n_occ_corr = n_occ - molecule.n_core_spin_orbitals if calculation.freeze_core else n_occ
    o_full = slice(0, n_occ)
    max_iter = int(calculation.correlated_max_iter)
    E_conv = calculation.energy_convergence

    from ..ops.linalg import expm_skew

    @partial(jax.jit, static_argnames=("n_steps",))
    def omp2_solve(C0, t0, ERI_sb, H_sb, E_HF, V_NN, n_steps):
        def body(carry):
            step, E_old, C, t_abij, _, _, conv, stats = carry
            H_core_SO = transforms.transform_matrix_ao_to_so(H_sb, C)
            ERI_SO = transforms.ao_to_so_physicists(ERI_sb, C, C)
            g = transforms.antisymmetrise(ERI_SO)
            F = transforms.spin_orbital_fock(H_core_SO, g, o_full)
            F_prime = F - jnp.diag(jnp.diagonal(F))
            epsilons = jnp.diagonal(F)

            t_1 = g[v, v, o, o]
            t_2 = jnp.einsum("ac,cbij->abij", F_prime[v, v], t_abij, optimize=True)
            t_3 = jnp.einsum("ki,abkj->abij", F_prime[o, o], t_abij, optimize=True)
            t_new = t_1 + t_2 - t_2.transpose(1, 0, 2, 3) - t_3 + t_3.transpose(0, 1, 3, 2)
            e_abij = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v).transpose(2, 3, 0, 1)
            t_new = t_new * e_abij

            P_corr = _t_amplitude_density_contribution(n_SO, t_new.transpose(2, 3, 0, 1), o, v)
            P_OMP2 = P_corr + P_ref

            D_corr = jnp.zeros((n_SO, n_SO, n_SO, n_SO))
            D_corr = D_corr.at[v, v, o, o].set(t_new)
            D_corr = D_corr.at[o, o, v, v].set(t_new.transpose(2, 3, 0, 1))
            D_2 = jnp.einsum("rp,sq->rspq", P_corr, P_ref, optimize=True)
            D_3 = jnp.einsum("rp,sq->rspq", P_ref, P_ref, optimize=True)
            D = (D_corr + D_2 - D_2.transpose(1, 0, 2, 3) - D_2.transpose(0, 1, 3, 2)
                 + D_2.transpose(1, 0, 3, 2) + D_3 - D_3.transpose(1, 0, 2, 3))

            F_gen = (jnp.einsum("pr,rq->pq", H_core_SO, P_OMP2, optimize=True)
                     + 0.5 * jnp.einsum("prst,stqr->pq", g, D, optimize=True))

            R = jnp.zeros((n_SO, n_SO))
            R = R.at[v, o].set((F_gen - F_gen.T)[v, o]
                               / (epsilons[n, o] - epsilons[v, n]))
            U = expm_skew(R - R.T)
            C_new = C @ U

            E_total = (V_NN + jnp.einsum("ij,ij->", P_OMP2, H_core_SO, optimize=True)
                       + 0.25 * jnp.einsum("ijkl,ijkl->", D, g, optimize=True))
            E_OMP2 = E_total - E_HF
            dE = E_OMP2 - E_old
            stats = stats.at[step - 1].set(jnp.stack([E_OMP2, dE]))
            return (step + 1, E_OMP2, C_new, t_new, P_corr, E_OMP2,
                    jnp.abs(dE) < E_conv, stats)

        def cond(carry):
            return (carry[0] <= n_steps) & ~carry[-2]

        stats0 = jnp.zeros((n_steps, 2))
        zero_P = jnp.zeros((n_SO, n_SO))
        carry0 = (jnp.asarray(1), jnp.asarray(0.0), C0, t0, zero_P,
                  jnp.asarray(0.0), jnp.asarray(False), stats0)
        out = jax.lax.while_loop(cond, body, carry0)
        step, _, C, t_abij, P_corr, E_OMP2, conv, stats = out
        return step - 1, E_OMP2, C, P_corr, conv, stats

    t0 = jnp.zeros((molecule.n_virt, molecule.n_virt, n_occ_corr, n_occ_corr))
    n_steps, E_j, C_spin_block, P_corr, converged, stats = omp2_solve(
        jnp.asarray(C_spin_block), t0, jnp.asarray(ERI_spin_block), H_core_sb,
        float(E_HF), float(V_NN), max_iter)

    n_steps = int(n_steps)
    stats = np.asarray(stats)
    for i in range(n_steps):
        log(f"  {i + 1:3.0f}           {stats[i, 0]:13.10f}         {stats[i, 1]:13.10f}",
            calculation, 1, silent=silent)
    if not bool(converged):
        error("Orbital-optimised MP2 failed to converge! Try increasing the maximum iterations?")
    E_OMP2 = float(E_j)

    log_spacer(calculation, silent=silent)
    log(f"\n  OMP2 correlation energy:            {E_OMP2:.10f}", calculation, 1, silent=silent)

    natural_occ, naturals = None, None
    P_OMP2_final = P_corr + jnp.zeros((n_SO, n_SO)).at[:n_occ, :n_occ].set(jnp.eye(n_occ))
    P, P_alpha, P_beta = transforms.density_so_to_ao(P_OMP2_final, C_spin_block, n_SO)
    if calculation.natural_orbitals:
        natural_occ, naturals = print_natural_orbitals(P, X, None, calculation, silent)
    return E_OMP2, P, P_alpha, P_beta, natural_occ, naturals


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def run_perturbation_theory_calculation(method, molecule, SCF_output, integrals,
                                        calculation, V_NN, grid_container,
                                        silent=False):
    E_MP2 = E_MP3 = E_MP4 = 0.0
    P, P_alpha, P_beta = SCF_output.P, SCF_output.P_alpha, SCF_output.P_beta
    n_SO = molecule.n_SO
    ERI_AO = integrals.ERI_AO
    X = SCF_output.X
    natural_occ, naturals = None, None
    K_XC, K_XC_full = None, None

    if calculation.reference == "UHF" or method.name == "OMP2":
        if not calculation.method.unrestricted_available:
            error("This electronic structure method is unavailable for unrestricted calculations!")
        (g, C_spin_block, epsilons_sorted, ERI_spin_block, o, v, spin_labels, _,
         ERI_SO) = transforms.begin_spin_orbital_calculation(
            molecule, ERI_AO, SCF_output, calculation, silent=silent)
        if calculation.DFT_calculation and calculation.relaxed_density:
            if not calculation.functional.time_dependent_available:
                error("The relaxed density is not yet available for this exchange-correlation functional!")
            from ..dft import kernels as dft_kernels
            K_XC, K_XC_full = dft_kernels.unrestricted_xc_kernel_matrices(
                slice(0, molecule.n_occ), v, P_alpha, P_beta, grid_container[0],
                C_spin_block, spin_labels, calculation, grid_container[1], silent,
                return_full_kernel=True)
    else:
        ERI_MO, molecular_orbitals, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
            molecule, ERI_AO, SCF_output, calculation, silent=silent)
        if calculation.DFT_calculation and calculation.relaxed_density:
            if not calculation.functional.time_dependent_available:
                error("The relaxed density is not yet available for this exchange-correlation functional!")
            from ..dft import kernels as dft_kernels
            K_XC, _, K_XC_full = dft_kernels.restricted_xc_kernel_matrices(
                slice(0, molecule.n_doubly_occ), v, SCF_output.density,
                grid_container[0], molecular_orbitals, calculation,
                grid_container[1], silent)

    timer("MP2", 0)
    if method.name == "OMP2":
        E_MP2, P, P_alpha, P_beta, natural_occ, naturals = run_orbital_optimised_MP2(
            molecule, calculation, g, C_spin_block, integrals.H_core, V_NN, n_SO,
            X, SCF_output.energy, ERI_spin_block, o, v, silent=silent)
        timer("MP2", 1)
    elif method.name == "IMP2":
        E_MP2, P, P_alpha, P_beta, natural_occ, naturals = run_iterative_restricted_MP2(
            ERI_MO, epsilons, molecular_orbitals, o, v, molecule.n_doubly_occ, X,
            integrals, calculation, SCF_output, silent=silent)
        timer("MP2", 1)
    elif method.name in ("LMP2", "AO-MP2"):
        E_MP2 = run_restricted_laplace_MP2(integrals, SCF_output.F, calculation,
                                           SCF_output.P, silent=silent)
        timer("MP2", 1)
    else:
        if calculation.reference == "UHF":
            E_MP2, P, P_alpha, P_beta, natural_occ, naturals = run_unrestricted_MP2(
                molecule, calculation, SCF_output, n_SO, o, ERI_spin_block, X,
                silent=silent, g=g, ERI_SO=ERI_SO, epsilons_sorted=epsilons_sorted,
                C_spin_block=C_spin_block, spin_labels=spin_labels, K_XC=K_XC,
                K_XC_full=K_XC_full)
        else:
            E_MP2, P, P_alpha, P_beta, natural_occ, naturals = run_restricted_MP2(
                ERI_MO, epsilons, molecular_orbitals, o, v, X, calculation,
                molecule, S=SCF_output.S, silent=silent, K_XC=K_XC,
                K_XC_full=K_XC_full)
        timer("MP2", 1)

        if method.method_base in ("MP3", "MP4"):
            timer("MP3", 0)
            if calculation.reference == "UHF":
                E_MP3 = run_unrestricted_MP3(calculation, g, epsilons_sorted, E_MP2,
                                             o, v, silent=silent)
            else:
                E_MP3, e_ijab, t_ijab, t_dash_ijab, L = run_restricted_MP3(
                    calculation, ERI_MO, epsilons, E_MP2, o, v, silent=silent)
            timer("MP3", 1)

            if method.method_base == "MP4":
                timer("MP4", 0)
                E_MP4 = run_restricted_MP4(e_ijab, t_ijab, t_dash_ijab, L, ERI_MO,
                                           epsilons, o, v, calculation, silent=silent)
                timer("MP4", 1)

    log_spacer(calculation, silent=silent)
    return E_MP2, E_MP3, E_MP4, P, P_alpha, P_beta, natural_occ, naturals
