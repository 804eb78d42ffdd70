"""Single-reference excited states: CIS / TDHF / TDA / TD-DFT, oscillator
strengths, transition dipoles, excited-state densities, absorption spectra
and the CIS(D) perturbative doubles correction.

The excitation Hamiltonian blocks are built on device (post.response); the
small (ov x ov) eigenproblems are solved on host (the full Casida problem is
non-Hermitian, which TPUs do not support).  Capability parity:
/root/reference/TUNA/tuna_ci.py:687-714, 1157-2299.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..output import error, log, log_big_spacer, log_spacer, timer, warning
from . import response, transforms


# ---------------------------------------------------------------------------
# Eigensolvers
# ---------------------------------------------------------------------------

def split_state_vector(column, n_occ, n_virt):
    """X (excitation) and Y (de-excitation) blocks of one state vector."""
    n_ia = n_occ * n_virt
    if column.shape[0] == 2 * n_ia:
        return (column[:n_ia].reshape(n_occ, n_virt),
                column[n_ia:].reshape(n_occ, n_virt))
    return column.reshape(n_occ, n_virt), np.zeros((n_occ, n_virt))


def solve_tda(A):
    """Hermitian (CIS / TDA) eigenproblem."""
    if A is None:
        return None, None
    return np.linalg.eigh(np.asarray(A))


def solve_casida(A, B):
    """Full non-Hermitian TDHF block problem [[A,B],[-B,-A]] with X^2 - Y^2
    metric normalisation; positive roots only, ascending."""
    if A is None or B is None:
        return None, None
    A, B = np.asarray(A), np.asarray(B)
    n_ia = A.shape[0]
    H = np.block([[A, B], [-B, -A]])
    energies, vectors = np.linalg.eig(H)

    if np.max(np.abs(energies.imag)) > constants.COMPLEX_EIG_THRESH:
        warning("Diagonalisation gave complex excitation energies - the "
                "reference may be unstable!", space=2)
    energies, vectors = energies.real, vectors.real

    X, Y = vectors[:n_ia], vectors[n_ia:]
    metric = np.einsum("in,in->n", X, X) - np.einsum("in,in->n", Y, Y)
    vectors = vectors / np.sqrt(np.abs(metric))

    keep = energies > 0
    energies, vectors = energies[keep], vectors[:, keep]
    order = energies.argsort()
    return energies[order], vectors[:, order]


# ---------------------------------------------------------------------------
# Stability analysis
# ---------------------------------------------------------------------------

def _report_hessian_eigenvalue(lowest, label, calculation, silent):
    log(f"\n  Lowest {label} eigenvalue:             {lowest:10.5f}"
        if "Hessian" not in label else
        f"\n  Lowest Hessian eigenvalue:             {lowest:10.5f}",
        calculation, 1, silent=silent)


def determine_self_consistent_field_stability(molecule, calculation, ERI_AO,
                                              SCF_output, bfs_on_grid=None,
                                              weights=None, silent=False):
    """Internal-stability check of the converged SCF via orbital Hessians
    (parity: tuna_ci.py:922-1114)."""
    K_XC_singlet = K_XC_triplet = K_XC = None

    if (calculation.method.density_functional_method
            and not calculation.functional.time_dependent_available):
        error("Stability analysis is not yet available for this "
              "exchange-correlation functional!")

    restricted = calculation.reference == "RHF"
    if restricted:
        g, mos, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
            molecule, ERI_AO, SCF_output, calculation, silent)
        if calculation.method.density_functional_method:
            from ..dft import kernels as dft_kernels
            K_XC_singlet, K_XC_triplet, _ = dft_kernels.restricted_xc_kernel_matrices(
                o, v, SCF_output.density, bfs_on_grid, mos, calculation,
                weights, silent)
    else:
        (g, C_spin_block, epsilons, _, o, v, spin_labels, _, ERI_SO) = \
            transforms.begin_spin_orbital_calculation(
                molecule, ERI_AO, SCF_output, calculation, silent)
        g = ERI_SO - calculation.HFX_prop * jnp.asarray(ERI_SO).transpose(0, 1, 3, 2)
        if calculation.method.density_functional_method:
            from ..dft import kernels as dft_kernels
            K_XC = dft_kernels.unrestricted_xc_kernel_matrices(
                o, v, SCF_output.P_alpha, SCF_output.P_beta, bfs_on_grid,
                C_spin_block, spin_labels, calculation, weights, silent)

    log_spacer(calculation, silent=silent, start="\n")
    log("                  Stability Analysis", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    if restricted:
        log("  Building singlet orbital Hessian...        ", calculation, 1, end="", silent=silent)
        g = jnp.asarray(g).transpose(0, 2, 1, 3)  # chemists' -> physicists'
        H_singlet = response.build_orbital_hessian(g, epsilons, o, v, calculation,
                                                   "singlet", K_XC_singlet)
        log("[Done]", calculation, 1, silent=silent)
        log("  Building triplet orbital Hessian...        ", calculation, 1, end="", silent=silent)
        H_triplet = response.build_orbital_hessian(g, epsilons, o, v, calculation,
                                                   "triplet", K_XC_triplet)
        log("[Done]", calculation, 1, silent=silent)
        log("\n  Diagonalising orbital Hessians...          ", calculation, 1, end="", silent=silent)
        lowest_singlet = float(np.linalg.eigvalsh(H_singlet)[0])
        lowest_triplet = float(np.linalg.eigvalsh(H_triplet)[0])
        log("[Done]", calculation, 1, silent=silent)

        log(f"\n  Lowest singlet eigenvalue:             {lowest_singlet:10.5f}", calculation, 1, silent=silent)
        log(f"  Lowest triplet eigenvalue:             {lowest_triplet:10.5f}", calculation, 1, silent=silent)

        threshold = constants.ORB_HESS_EIG_THRESH
        if lowest_singlet <= threshold:
            log("\n  The SCF is unstable wrt. restricted rotations.", calculation, 1, silent=silent)
        if lowest_triplet <= threshold:
            log("\n  The SCF is unstable wrt. unrestricted rotations.", calculation, 1, silent=silent)
        if lowest_singlet > threshold and lowest_triplet > threshold:
            log("\n  The self-consistent field solution is stable!", calculation, 1, silent=silent)
    else:
        log("  Building unrestricted orbital Hessian...   ", calculation, 1, end="", silent=silent)
        H = response.build_orbital_hessian(g, epsilons, o, v, calculation,
                                           hessian_type=None, K_XC=K_XC,
                                           spin_labels=spin_labels)
        log("[Done]", calculation, 1, silent=silent)
        log("\n  Diagonalising orbital Hessian...           ", calculation, 1, end="", silent=silent)
        lowest = float(np.linalg.eigvalsh(H)[0])
        log("[Done]", calculation, 1, silent=silent)
        log(f"\n  Lowest Hessian eigenvalue:             {lowest:10.5f}", calculation, 1, silent=silent)
        if lowest <= constants.ORB_HESS_EIG_THRESH:
            log("\n  The SCF is unstable wrt. unrestricted rotations.", calculation, 1, silent=silent)
        else:
            log("\n  The self-consistent field solution is stable!", calculation, 1, silent=silent)

    log_spacer(calculation, silent=silent)


# ---------------------------------------------------------------------------
# State solvers
# ---------------------------------------------------------------------------

def _print_excited_state_header(calculation, silent):
    log_spacer(calculation, silent=silent, start="\n")
    if calculation.method.density_functional_method:
        log("      Time-dependent Density Functional Theory", calculation, 1, silent=silent)
    elif calculation.tamm_dancoff_approximation:
        log("          Configuration Interaction Singles", calculation, 1, silent=silent)
    else:
        log("            Time-dependent Hartree-Fock", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    if calculation.tamm_dancoff_approximation:
        log("  Using the Tamm-Dancoff approximation...\n", calculation, 1, silent=silent)
    else:
        log("  Not using the Tamm-Dancoff approximation...\n", calculation, 1, silent=silent)

    if calculation.reference == "RHF":
        if not calculation.calculate_no_triplets and not calculation.calculate_no_singlets:
            log("  Singlet and triplet states will be calculated.", calculation, 1, silent=silent)
        elif not calculation.calculate_no_triplets:
            log("  Only triplet states will be calculated.", calculation, 1, silent=silent)
        else:
            log("  Only singlet states will be calculated.", calculation, 1, silent=silent)


def restricted_excited_states(g, epsilons, o, v, calculation, silent=False,
                              K_XC_singlet=None, K_XC_triplet=None):
    """Singlet / triplet CIS or TDHF states for a closed-shell reference."""
    if "CIS" in calculation.method.name:
        calculation.tamm_dancoff_approximation = True
    _print_excited_state_header(calculation, silent)
    timer("Excited state calculation", 0)

    g = jnp.asarray(g).transpose(0, 2, 1, 3)  # chemists' -> physicists'
    tda = calculation.tamm_dancoff_approximation

    log("\n  Building excited state Hamiltonian...      ", calculation, 1, end="", silent=silent)
    A_s = A_t = B_s = B_t = None
    if not calculation.calculate_no_singlets:
        A_s = response.singlet_A(calculation, g, epsilons, o, v, K_XC_singlet)
        if not tda:
            B_s = response.singlet_B(calculation, g, o, v, K_XC_singlet)
    if not calculation.calculate_no_triplets:
        A_t = response.triplet_A(calculation, g, epsilons, o, v, K_XC_triplet)
        if not tda:
            B_t = response.triplet_B(calculation, g, o, v, K_XC_triplet)
    log("[Done]", calculation, 1, silent=silent)

    log("  Diagonalising Hamiltonian...               ", calculation, 1, end="", silent=silent)
    if tda:
        singlet_energies, singlet_vectors = solve_tda(A_s)
        triplet_energies, triplet_vectors = solve_tda(A_t)
    else:
        singlet_energies, singlet_vectors = solve_casida(A_s, B_s)
        triplet_energies, triplet_vectors = solve_casida(A_t, B_t)
    log("[Done]", calculation, 1, silent=silent)

    timer("Excited state calculation", 1)
    return singlet_energies, triplet_energies, singlet_vectors, triplet_vectors


def unrestricted_excited_states(g, epsilons, o, v, n_occ, n_virt, spin_labels,
                                calculation, silent=False, K_XC=None):
    """Spin-conserving CIS or TDHF states for an unrestricted reference."""
    if "CIS" in calculation.method.name:
        calculation.tamm_dancoff_approximation = True
    _print_excited_state_header(calculation, silent)
    timer("Excited state calculation", 0)

    spin_occ = np.array(spin_labels)[o]
    spin_virt = np.array(spin_labels)[v]
    conserving = (spin_occ[:, None] == spin_virt[None, :]).ravel()
    n_conserving = int(np.sum(conserving))

    log("  Building excited state Hamiltonian...      ", calculation, 1, end="", silent=silent)
    A = np.asarray(response.spin_orbital_A(calculation, g, epsilons, o, v, K_XC))
    A = A[np.ix_(conserving, conserving)]
    log("[Done]", calculation, 1, silent=silent)

    log("  Diagonalising Hamiltonian...               ", calculation, 1, end="", silent=silent)
    if calculation.tamm_dancoff_approximation:
        energies, vectors = np.linalg.eigh(A)
        full_vectors = np.zeros((n_occ * n_virt, len(energies)))
        full_vectors[conserving, :] = vectors
    else:
        B = np.asarray(response.spin_orbital_B(calculation, g, o, v, K_XC))
        B = B[np.ix_(conserving, conserving)]
        energies, vectors = solve_casida(A, B)
        full_vectors = np.zeros((2 * n_occ * n_virt, len(energies)))
        full_vectors[:n_occ * n_virt][conserving, :] = vectors[:n_conserving]
        full_vectors[n_occ * n_virt:][conserving, :] = vectors[n_conserving:]
    log("[Done]", calculation, 1, silent=silent)

    timer("Excited state calculation", 1)
    return energies, full_vectors


# ---------------------------------------------------------------------------
# Transition properties
# ---------------------------------------------------------------------------

def calculate_oscillator_strengths(transition_dipoles, excitation_energies):
    return (2.0 / 3.0) * excitation_energies * transition_dipoles**2


def _transition_dipole_norms(D_MO, vectors, n_occ, n_virt, o, v):
    norms = []
    for state in range(vectors.shape[1]):
        X, Y = split_state_vector(vectors[:, state], n_occ, n_virt)
        trans = X + Y
        norms.append(np.linalg.norm([np.sum(np.asarray(M)[o, v] * trans)
                                     for M in D_MO]))
    return norms


def restricted_transition_dipoles(SCF_output, singlet_vectors, triplet_vectors,
                                  n_occ, n_virt, o, v):
    C = jnp.asarray(SCF_output.molecular_orbitals)
    D_MO = [transforms.transform_matrix_ao_to_so(jnp.asarray(M), C)
            for M in SCF_output.D]
    dipoles = []
    if singlet_vectors is not None:
        dipoles += _transition_dipole_norms(D_MO, singlet_vectors, n_occ, n_virt, o, v)
    if triplet_vectors is not None:
        dipoles += [0.0] * triplet_vectors.shape[1]  # spin-forbidden
    return np.array(dipoles) * np.sqrt(2.0)


def unrestricted_transition_dipoles(SCF_output, vectors, n_occ, n_virt, o, v,
                                    C_spin_block):
    D_SO = [transforms.transform_matrix_ao_to_so(
        transforms.spin_block_matrix(jnp.asarray(M)), jnp.asarray(C_spin_block))
        for M in SCF_output.D]
    return np.array(_transition_dipole_norms(D_SO, vectors, n_occ, n_virt, o, v))


# ---------------------------------------------------------------------------
# State density and energy
# ---------------------------------------------------------------------------

def _difference_density_MO(X, Y, n_orbitals, o, v):
    P = np.zeros((n_orbitals, n_orbitals))
    P[v, v] = np.einsum("ia,ib->ab", X, X) + np.einsum("ia,ib->ab", Y, Y)
    P[o, o] = -(np.einsum("ia,ja->ij", X, X) + np.einsum("ia,ja->ij", Y, Y))
    return P


def excited_state_energy_and_density(excitation_energies, excitation_vectors,
                                     state, n_occ, n_virt, SCF_output, o, v,
                                     orbitals, restricted):
    if state >= len(excitation_energies):
        error(f"Specified root ({state + 1}) does not exist!")
    E_transition = excitation_energies[state]
    X, Y = split_state_vector(excitation_vectors[:, state], n_occ, n_virt)

    if restricted:
        P_diff_MO = _difference_density_MO(X, Y, np.asarray(SCF_output.P).shape[0], o, v)
        C = np.asarray(orbitals)
        P_diff = C @ P_diff_MO @ C.T
        P_diff_alpha = P_diff_beta = P_diff / 2.0
    else:
        n_SO = np.asarray(orbitals).shape[1]
        P_diff_MO = _difference_density_MO(X, Y, n_SO, o, v)
        P_diff, P_diff_alpha, P_diff_beta = transforms.density_so_to_ao(
            jnp.asarray(P_diff_MO), jnp.asarray(orbitals), n_SO)
        P_diff, P_diff_alpha, P_diff_beta = (np.asarray(P_diff),
                                             np.asarray(P_diff_alpha),
                                             np.asarray(P_diff_beta))

    E_state = SCF_output.energy + E_transition
    P_state = np.asarray(SCF_output.P) + P_diff
    P_state_alpha = np.asarray(SCF_output.P_alpha) + np.asarray(P_diff_alpha)
    P_state_beta = np.asarray(SCF_output.P_beta) + np.asarray(P_diff_beta)
    return (E_state, E_transition, P_state, P_state_alpha, P_state_beta,
            P_diff, P_diff_alpha, P_diff_beta)


# ---------------------------------------------------------------------------
# Printing
# ---------------------------------------------------------------------------

def print_absorption_spectrum(molecule, excitation_energies, calculation,
                              transition_dipoles, oscillator_strengths,
                              state_types, silent=False):
    wavelengths_nm = 1e7 / (excitation_energies * constants.PER_CM_IN_HARTREE)
    energies_eV = constants.EV_IN_HARTREE * excitation_energies

    log_spacer(calculation, silent=silent, start="\n")
    log(f"\n Transition dipole moment origin is the centre of mass, "
        f"{constants.bohr_to_angstrom(molecule.centre_of_mass):.4f} angstroms "
        "from the first atom.", calculation, 1, silent=silent)
    log_big_spacer(calculation, silent=silent, start="\n")
    log("                                     Excited State Absorption Spectrum",
        calculation, 1, silent=silent)
    log_big_spacer(calculation, silent=silent)
    log("   State         Energy          Energy (eV)     Wavelength (nm)    "
        "Osc. Strength     Transition Dipole", calculation, 1, silent=silent)
    log_big_spacer(calculation, silent=silent)

    for state in range(len(excitation_energies)):
        if state < calculation.n_states:
            state_type = (" - " + state_types[state][0]
                          if calculation.reference == "RHF" else "  ")
            gap = "" if calculation.reference == "RHF" else "  "
            log(f"  {gap}{(state + 1):2}{state_type.upper()}  "
                f"{excitation_energies[state]:16.10f}  {energies_eV[state]:14.5f}   "
                f"{wavelengths_nm[state]:16.5f}       "
                f"{oscillator_strengths[state]:10.5f}          "
                f"{transition_dipoles[state]:10.5f}", calculation, 1, silent=silent)
    log_big_spacer(calculation, silent=silent)


def print_state_contributions(calculation, silent, excitation_energies,
                              excitation_vectors, state_types, n_occ, n_virt,
                              o, orbital_labels=None):
    log("\n  Printing excited state information...", calculation, 2, silent=silent)
    log(f"  Only printing contributions larger than "
        f"{calculation.excited_state_contribution_threshold:.1f} %.",
        calculation, 2, silent=silent)

    for state in range(min(len(excitation_energies), calculation.n_states)):
        log(f"\n  ~~~~~ State {state + 1} ~~~~~  {state_types[state].capitalize()}",
            calculation, 2, silent=silent)
        log(f"\n  Excitation energy: {excitation_energies[state]:16.10f}\n",
            calculation, 2, silent=silent)

        X, Y = split_state_vector(excitation_vectors[:, state], n_occ, n_virt)
        contributions = 100.0 * (X**2 - Y**2)

        for index in np.argsort(contributions, axis=None)[::-1]:
            i, a = divmod(index, n_virt)
            if contributions[i, a] <= calculation.excited_state_contribution_threshold:
                break
            if orbital_labels is not None:
                occ_label = orbital_labels[o.start + i]
                virt_label = orbital_labels[o.stop + a]
            else:
                occ_label, virt_label = f"{o.start + i + 1}", f"{o.stop + a + 1}"
            log(f"    {occ_label:>4}  ->  {virt_label:<4}  "
                f"{contributions[i, a]:7.2f} %", calculation, 2, silent=silent)


# ---------------------------------------------------------------------------
# CIS(D) perturbative doubles correction
# ---------------------------------------------------------------------------

def _print_doubles_result(E_D, E_D_scaled, excitation_energy, calculation, silent):
    log(f"\n  Original excitation energy:       {excitation_energy:15.10f}", calculation, 1, silent=silent)
    log(f"  Correction energy from (D):       {E_D:15.10f}", calculation, 1, silent=silent)
    log(f"  Correction energy (eV):           {(E_D * constants.EV_IN_HARTREE):15.10f}", calculation, 3, silent=silent)
    if calculation.MPC_requested or calculation.DFT_calculation:
        log(f"  Scaled correction energy:         {E_D_scaled:15.10f}", calculation, 1, silent=silent)
    log(f"\n  Corrected excitation energy:      {(E_D_scaled + excitation_energy):15.10f}", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)


def restricted_doubles_correction(excitation_energy, epsilons, root, g, o, v,
                                  b_ia, state_type, calculation, silent=False):
    """Spin-adapted CIS(D) (Head-Gordon, Rico, Oumi, Lee, CPL 219, 21 (1994);
    parity: tuna_ci.py:1870-2014)."""
    log_spacer(calculation, silent=silent, start="\n")
    log("          Perturbative Doubles Correction", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log(f"  Applying doubles correction to state {root + 1} only.", calculation, 1, silent=silent)
    log("\n  Building doubles amplitudes...           ", calculation, 1, end="", silent=silent)

    g = jnp.asarray(g)
    b_ia = jnp.asarray(b_ia)
    epsilons = jnp.asarray(epsilons)
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    shifted = 1.0 / (1.0 / e_ijab + excitation_energy)
    t_ijab = g[o, o, v, v] * e_ijab
    log("  [Done]", calculation, 1, silent=silent)

    log("\n  Calculating direct contribution...  ", calculation, 1, end="", silent=silent)
    particle_1 = jnp.einsum("abcj,ic->ijab", g[v, v, v, o], b_ia, optimize=True)
    particle_2 = jnp.einsum("abic,jc->ijab", g[v, v, o, v], b_ia, optimize=True)
    hole_1 = jnp.einsum("kaji,kb->ijab", g[o, v, o, o], b_ia, optimize=True)
    hole_2 = jnp.einsum("kbij,ka->ijab", g[o, v, o, o], b_ia, optimize=True)

    u_S = particle_1 + particle_2 - hole_1 - hole_2
    u_T = particle_1 - particle_2 + hole_1 - hole_2
    u_S_x = u_S.transpose(1, 0, 2, 3)

    def pair_sum(x, y):
        return float(jnp.einsum("ijab,ijab,ijab->", shifted, x, y, optimize=True))

    if state_type == "singlet":
        E_direct = pair_sum(u_S, u_S) - 0.5 * pair_sum(u_S, u_S_x)
    else:
        E_direct = (0.5 * pair_sum(u_S, u_S) - 0.5 * pair_sum(u_S, u_S_x)
                    + 0.5 * pair_sum(u_T, u_T))
    log("       [Done]", calculation, 1, silent=silent)

    log("  Calculating indirect contribution...  ", calculation, 1, end="", silent=silent)
    J = g[o, o, v, v]
    K = g[o, o, v, v].swapaxes(2, 3)
    u2 = 2.0 * t_ijab - t_ijab.transpose(0, 1, 3, 2)

    if state_type == "singlet":
        v_ia = jnp.einsum("jkbc,jb,ikac->ia", 2 * J - K, b_ia, u2, optimize=True)
    else:
        v_ia = jnp.einsum("jkbc,jb,ikac->ia", K, b_ia,
                          t_ijab.transpose(0, 1, 3, 2), optimize=True)

    v_ia = v_ia + (0.5 * jnp.einsum("jkbc,ja,ikcb->ia", J, b_ia, t_ijab, optimize=True)
                   - jnp.einsum("jkbc,ja,ikbc->ia", J, b_ia, t_ijab, optimize=True)
                   - jnp.einsum("jkbc,ja,ikcb->ia", K, b_ia, t_ijab, optimize=True)
                   + 0.5 * jnp.einsum("jkbc,ja,ikbc->ia", K, b_ia, t_ijab, optimize=True))
    v_ia = v_ia + (0.5 * jnp.einsum("jkbc,ib,jkca->ia", J, b_ia, t_ijab, optimize=True)
                   - jnp.einsum("jkbc,ib,jkac->ia", J, b_ia, t_ijab, optimize=True)
                   - jnp.einsum("jkbc,ib,jkca->ia", K, b_ia, t_ijab, optimize=True)
                   + 0.5 * jnp.einsum("jkbc,ib,jkac->ia", K, b_ia, t_ijab, optimize=True))
    log("     [Done]", calculation, 1, silent=silent)

    log("\n  Calculating doubles correction...         ", calculation, 1, end="", silent=silent)
    E_D = E_direct + float(jnp.einsum("ia,ia->", b_ia, v_ia, optimize=True))
    E_D_scaled = (E_D * calculation.MPC_prop
                  if calculation.MPC_requested or calculation.DFT_calculation else E_D)
    _print_doubles_result(E_D, E_D_scaled, excitation_energy, calculation, silent)
    return E_D_scaled


def unrestricted_doubles_correction(excitation_energy, epsilons, root, g, o, v,
                                    b_ia, calculation, silent=False):
    """Spin-orbital CIS(D) (parity: tuna_ci.py:2024-2145)."""
    log_spacer(calculation, silent=silent, start="\n")
    log("          Perturbative Doubles Correction", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log(f"  Applying doubles correction to state {root + 1} only.", calculation, 1, silent=silent)
    log("\n  Building doubles amplitudes...             ", calculation, 1, end="", silent=silent)

    g = jnp.asarray(g)
    b_ia = jnp.asarray(b_ia)
    epsilons = jnp.asarray(epsilons)
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    shifted = 1.0 / (1.0 / e_ijab + excitation_energy)
    t_ijab = g[o, o, v, v] * e_ijab
    log("[Done]", calculation, 1, silent=silent)

    log("\n  Calculating direct contribution...         ", calculation, 1, end="", silent=silent)
    u_ijab = (jnp.einsum("abcj,ic->ijab", g[v, v, v, o], b_ia, optimize=True)
              - jnp.einsum("abci,jc->ijab", g[v, v, v, o], b_ia, optimize=True)
              + jnp.einsum("kaij,kb->ijab", g[o, v, o, o], b_ia, optimize=True)
              - jnp.einsum("kbij,ka->ijab", g[o, v, o, o], b_ia, optimize=True))
    log("[Done]", calculation, 1, silent=silent)

    log("  Calculating indirect contribution...       ", calculation, 1, end="", silent=silent)
    v_ia = (0.5 * jnp.einsum("jkbc,ib,jkca->ia", g[o, o, v, v], b_ia, t_ijab, optimize=True)
            + 0.5 * jnp.einsum("jkbc,ja,ikcb->ia", g[o, o, v, v], b_ia, t_ijab, optimize=True)
            + jnp.einsum("jkbc,jb,ikac->ia", g[o, o, v, v], b_ia, t_ijab, optimize=True))
    log("[Done]", calculation, 1, silent=silent)

    log("\n  Calculating doubles correction...          ", calculation, 1, end="", silent=silent)
    E_D = (0.25 * float(jnp.einsum("ijab,ijab,ijab->", u_ijab, u_ijab, shifted, optimize=True))
           + float(jnp.einsum("ia,ia->", b_ia, v_ia, optimize=True)))
    log("[Done]", calculation, 1, silent=silent)

    E_D_scaled = (E_D * calculation.MPC_prop
                  if calculation.MPC_requested or calculation.DFT_calculation else E_D)
    _print_doubles_result(E_D, E_D_scaled, excitation_energy, calculation, silent)
    return E_D_scaled


def run_perturbative_doubles(state, n_occ, n_virt, excitation_vectors, g,
                             epsilons, o, v, state_types, state_result,
                             calculation, silent):
    timer("Perturbative doubles", 0)
    X, Y = split_state_vector(excitation_vectors[:, state], n_occ, n_virt)
    b_ia = X + Y

    if calculation.reference == "RHF":
        E_CIS_D = restricted_doubles_correction(
            state_result[1], epsilons, state, jnp.asarray(g).transpose(0, 2, 1, 3),
            o, v, b_ia, state_types[state], calculation, silent)
    else:
        E_CIS_D = unrestricted_doubles_correction(
            state_result[1], epsilons, state, g, o, v, b_ia, calculation, silent)

    state_result = (state_result[0] + E_CIS_D, state_result[1] + E_CIS_D) + state_result[2:]
    timer("Perturbative doubles", 1)
    return state_result


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def run_excited_state_calculation(molecule, calculation, SCF_output,
                                  bfs_on_grid=None, weights=None, silent=False):
    """TD-HF / TD-DFT / CIS(-D) excited states (parity: tuna_ci.py:2146-2299)."""
    if calculation.calculate_no_singlets and calculation.calculate_no_triplets:
        error("There are no excited states to calculate!")
    if (calculation.method.density_functional_method
            and not calculation.functional.time_dependent_available):
        error("Time-dependent DFT is not yet available for this "
              "exchange-correlation functional!")
    if (not calculation.method.excited_state_method
            and not calculation.method.density_functional_method
            and not calculation.method.name == "HF"):
        error(f"Excited states are not available with {calculation.method.name}!")

    K_XC_singlet = K_XC_triplet = K_XC = None
    spin_orbital_labels = None
    state = calculation.root - 1
    restricted = calculation.reference == "RHF"

    if restricted:
        g, orbitals, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
            molecule, SCF_output.integrals.ERI_AO, SCF_output, calculation, silent)
        n_occ, n_virt = o.stop - (o.start or 0), molecule.n_doubly_virt

        if calculation.method.density_functional_method:
            from ..dft import kernels as dft_kernels
            K_XC_singlet, K_XC_triplet, _ = dft_kernels.restricted_xc_kernel_matrices(
                o, v, SCF_output.density, bfs_on_grid, orbitals, calculation,
                weights, silent)

        (singlet_energies, triplet_energies, singlet_vectors,
         triplet_vectors) = restricted_excited_states(
            g, epsilons, o, v, calculation, silent, K_XC_singlet, K_XC_triplet)

        excitation_energies = np.concatenate(
            [e for e in (singlet_energies, triplet_energies) if e is not None])
        excitation_vectors = np.concatenate(
            [vec for vec in (singlet_vectors, triplet_vectors) if vec is not None],
            axis=1)
        state_types = np.concatenate(
            [np.full(len(e), label) for e, label in
             ((singlet_energies, "singlet"), (triplet_energies, "triplet"))
             if e is not None])
    else:
        (g, C_spin_block, epsilons, _, o, v, spin_labels, spin_orbital_labels,
         ERI_SO) = transforms.begin_spin_orbital_calculation(
            molecule, SCF_output.integrals.ERI_AO, SCF_output, calculation, silent)
        orbitals = C_spin_block
        n_occ, n_virt = o.stop - (o.start or 0), molecule.n_virt

        if calculation.method.density_functional_method:
            from ..dft import kernels as dft_kernels
            K_XC = dft_kernels.unrestricted_xc_kernel_matrices(
                o, v, SCF_output.P_alpha, SCF_output.P_beta, bfs_on_grid,
                C_spin_block, spin_labels, calculation, weights, silent)

        g_scaled = jnp.asarray(ERI_SO) - calculation.HFX_prop * jnp.asarray(ERI_SO).transpose(0, 1, 3, 2)
        excitation_energies, excitation_vectors = unrestricted_excited_states(
            g_scaled, epsilons, o, v, n_occ, n_virt, spin_labels, calculation,
            silent, K_XC)
        state_types = np.array([""] * len(excitation_energies))

    log("\n  Calculating oscillator strengths...        ", calculation, 1, end="", silent=silent)
    if restricted:
        transition_dipoles = restricted_transition_dipoles(
            SCF_output, singlet_vectors, triplet_vectors, n_occ, n_virt, o, v)
    else:
        transition_dipoles = unrestricted_transition_dipoles(
            SCF_output, excitation_vectors, n_occ, n_virt, o, v, C_spin_block)
    oscillator_strengths = calculate_oscillator_strengths(
        transition_dipoles, excitation_energies)
    log("[Done]", calculation, 1, silent=silent)

    order = np.argsort(excitation_energies)
    excitation_vectors = excitation_vectors[:, order]
    excitation_energies, state_types, transition_dipoles, oscillator_strengths = (
        arr[order] for arr in (excitation_energies, state_types,
                               transition_dipoles, oscillator_strengths))

    log("  Constructing density matrix...             ", calculation, 1, end="", silent=silent)
    state_result = excited_state_energy_and_density(
        excitation_energies, excitation_vectors, state, n_occ, n_virt,
        SCF_output, o, v, orbitals, restricted)
    log("[Done]", calculation, 1, silent=silent)

    print_state_contributions(calculation, silent, excitation_energies,
                              excitation_vectors, state_types, n_occ, n_virt,
                              o, spin_orbital_labels)
    print_absorption_spectrum(molecule, excitation_energies, calculation,
                              transition_dipoles, oscillator_strengths,
                              state_types, silent)

    if (calculation.do_perturbative_doubles or "[D]" in calculation.method.name
            or "(D)" in calculation.method.name):
        state_result = run_perturbative_doubles(
            state, n_occ, n_virt, excitation_vectors, g, epsilons, o, v,
            state_types, state_result, calculation, silent)

    if calculation.plot_absorbance_spectrum:
        from .. import plotting
        plotting.generate_absorbance_spectrum(calculation, excitation_energies,
                                              oscillator_strengths)

    return state_result
