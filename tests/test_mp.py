"""Tests for Moller-Plesset perturbation theory.

Primary validation: the restricted (spatial-orbital) and unrestricted
(spin-orbital) code paths are completely independent implementations, so
their agreement on closed-shell systems is a strong correctness check.
"""

import numpy as np
import pytest

from tuna_tpu.cli import run


def final_energy(line):
    _, _, energy, _ = run(line, suppress_output=True)
    return energy


def test_rmp2_equals_ump2_closed_shell():
    E_r = final_energy("SPE : LI H 1.6 : MP2 6-31G")
    E_u = final_energy("SPE : LI H 1.6 : UMP2 6-31G : NOROTATE")
    assert abs(E_r - E_u) < 1e-9


def test_rmp3_equals_ump3_closed_shell():
    E_r = final_energy("SPE : H H 0.74 : MP3 6-31G**")
    E_u = final_energy("SPE : H H 0.74 : UMP3 6-31G** : NOROTATE")
    assert abs(E_r - E_u) < 1e-9


def test_scs_mp2_scaling():
    """SCS-MP2 equals manual recombination of the spin components."""
    from tuna_tpu.config import Config
    from tuna_tpu.methods import lookup_method

    E_mp2 = final_energy("SPE : N N 1.1 : MP2 STO-3G")
    E_hf = final_energy("SPE : N N 1.1 : HF STO-3G")
    E_scs = final_energy("SPE : N N 1.1 : SCS-MP2 STO-3G")
    # Components via custom scaling keywords: SSS 1 OSS 0 -> same-spin only
    E_ss = final_energy("SPE : N N 1.1 : SCS-MP2 STO-3G : SSS 1.0 OSS 0.0")
    E_os = final_energy("SPE : N N 1.1 : SCS-MP2 STO-3G : SSS 0.0 OSS 1.0")
    corr_ss = E_ss - E_hf
    corr_os = E_os - E_hf
    assert abs((E_hf + corr_ss + corr_os) - E_mp2) < 1e-9
    assert abs((E_hf + corr_ss / 3 + 1.2 * corr_os) - E_scs) < 1e-9


def test_mp2_h2_vs_explicit():
    """H2/STO-3G MP2 correlation energy against an explicit two-orbital formula."""
    SCF_output, molecule, E_total, _ = run("SPE : H H 0.74 : MP2 STO-3G",
                                           suppress_output=True)
    from tuna_tpu.post.transforms import ao_to_mo_chemists
    eri_mo = np.array(ao_to_mo_chemists(SCF_output.integrals.ERI_AO,
                                        SCF_output.molecular_orbitals))
    eps = np.array(SCF_output.epsilons)
    # Minimal-basis H2: single (ia|ia)-type contribution
    K = eri_mo[0, 1, 0, 1]
    E_MP2_ref = K**2 / (2 * (eps[0] - eps[1]))
    E_corr = E_total - SCF_output.energy
    assert abs(E_corr - E_MP2_ref) < 1e-10


def test_imp2_matches_mp2():
    E_mp2 = final_energy("SPE : H H 0.74 : MP2 6-31G")
    E_imp2 = final_energy("SPE : H H 0.74 : IMP2 6-31G : ECONV 1e-12")
    # The Hylleraas functional is variational: the energy-change stopping
    # criterion is quadratic in the amplitude error, so residual error remains
    assert abs(E_mp2 - E_imp2) < 5e-7


def test_laplace_mp2_close_to_mp2():
    E_mp2 = final_energy("SPE : H H 0.74 : MP2 6-31G")
    E_lmp2 = final_energy("SPE : H H 0.74 : LMP2 6-31G : MPGRID 20")
    assert abs(E_mp2 - E_lmp2) < 1e-6


def test_omp2_below_mp2():
    """Orbital optimisation lowers (or matches) the MP2 energy."""
    E_mp2 = final_energy("SPE : LI H 1.6 : MP2 STO-3G")
    E_omp2 = final_energy("SPE : LI H 1.6 : OMP2 STO-3G : ECONV 1e-10")
    assert E_omp2 < E_mp2 + 1e-8


def test_mp4_runs_and_orders():
    """MP4(DQ), MP4(SDQ) and MP4 give increasing amounts of correlation for N2."""
    E_dq = final_energy("SPE : H H 0.74 : MP4[DQ] 6-31G")
    E_sdq = final_energy("SPE : H H 0.74 : MP4[SDQ] 6-31G")
    E_full = final_energy("SPE : H H 0.74 : MP4 6-31G")
    # For H2 (two electrons) triples vanish: MP4 == MP4(SDQ)
    assert abs(E_full - E_sdq) < 1e-10
    assert E_sdq <= E_dq + 1e-12
