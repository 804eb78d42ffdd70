"""Multi-point driver tests (L6/L7): OPT, FORCE, FREQ, MD, SCAN, IP/EA/BDE,
polarisability, CBS extrapolation and thermochemistry at STO-3G scale, plus
the analytic-vs-finite-difference gradient cross-check."""

import time

import numpy as np
import pytest

from tuna_tpu.cli import parse_input, process_method, run
from tuna_tpu.config import Config


def make_config(line):
    ct, ms, basis, symbols, coords, params = parse_input(line)
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    return cfg, symbols, coords


@pytest.mark.smoke
def test_analytic_gradient_matches_finite_difference():
    from tuna_tpu.drivers import energy as energ, gradients, opt

    cfg, symbols, coords = make_config("SPE : H H 0.9 : HF STO-3G : TIGHTSCF")
    SCF_output, molecule, _, _ = energ.evaluate_molecular_energy(
        cfg, symbols, coords, silent=True)
    g_analytic = gradients.calculate_analytic_gradient(molecule, cfg, SCF_output,
                                                       coords)
    g_fd = opt.calculate_gradient(coords, cfg, symbols, silent=True)
    assert abs(g_analytic - g_fd) < 1e-6


@pytest.mark.parametrize("line", [
    "SPE : H H 0.9 : B3LYP 6-31G : TIGHTSCF",      # hybrid GGA
    "SPE : H H 0.9 : TPSS STO-3G : TIGHTSCF",      # meta-GGA
    "SPE : H HE 0.9 : UB3LYP STO-3G : ML 2 TIGHTSCF",  # unrestricted hybrid
])
def test_dft_analytic_gradient_matches_finite_difference(line):
    """The autodiff KS gradient (incl. moving-grid and Becke-weight terms)
    must agree with central finite differences of the full SCF energy."""
    from tuna_tpu.drivers import energy as energ, gradients, opt

    cfg, symbols, coords = make_config(line)
    SCF_output, molecule, _, _ = energ.evaluate_molecular_energy(
        cfg, symbols, coords, silent=True)
    assert gradients.analytic_gradient_available(cfg, molecule)
    g_analytic = gradients.calculate_analytic_gradient(molecule, cfg,
                                                       SCF_output, coords)
    g_fd = opt.calculate_gradient(coords, cfg, symbols, silent=True)
    assert abs(g_analytic - g_fd) < 5e-7


def test_opt_converges_h2():
    molecule, energy = run("OPT : H H 1.0 : HF STO-3G", suppress_output=True)
    # HF/STO-3G equilibrium bond length of H2 is 1.346 bohr
    assert abs(molecule.bond_length - 1.3459) < 1e-3
    assert energy < -1.117


def test_force_single_iteration():
    result = run("FORCE : H H 1.0 : HF STO-3G", suppress_output=True)
    assert result is None  # single gradient iteration, no convergence claim


def test_freq_h2():
    hessian, reduced_mass, frequency_per_cm, zpe = run(
        "FREQ : H H 0.7375 : HF STO-3G", suppress_output=True)
    # near-equilibrium H2 harmonic frequency ~ 5480 per cm at HF/STO-3G
    assert 5000 < frequency_per_cm < 6000
    assert zpe > 0


def test_md_nve_runs():
    run("MD : H H 1.0 : HF STO-3G : NUM 4 NOTRAJ", suppress_output=True)


def test_scan_bond():
    bond_lengths, energies, dipoles = run(
        "SCAN : H H 0.6 : HF STO-3G : NUM 4 STEP 0.1", suppress_output=True)
    assert len(energies) == 4
    # energy minimum should lie between the endpoints for this range
    assert min(energies) < energies[0] and min(energies) < energies[-1]


def test_ip_koopmans_vertical():
    result = run("IP : H H 0.74 : HF STO-3G", suppress_output=True)
    assert result is not None


def test_bde_with_ghost_counterpoise():
    """Counterpoise-corrected BDE pinned against the reference oracle
    (tools/reference_oracle + tuna_opt.calculate_bond_dissociation_energy
    gives 0.1754531426 Ha for H2/STO-3G HF)."""
    cfg, symbols, coords = make_config("BDE : H H 0.74 : HF STO-3G")
    from tuna_tpu.drivers import composite
    bde = composite.calculate_bond_dissociation_energy(cfg, symbols, coords)
    assert abs(float(bde) - 0.1754531426) < 1e-8


def test_polarisability():
    """Isotropic polarisability pinned against the reference oracle
    (tuna_energy.calculate_polarisability: 1.022098446656905 for H2/STO-3G
    HF; agreement bounded by the shared finite-field stencil's noise)."""
    cfg, symbols, coords = make_config("SPE : H H 0.74 : HF STO-3G : POLAR")
    from tuna_tpu.drivers import energy as energ, electric
    SCF_output, molecule, E, P = energ.calculate_energy(
        cfg, symbols, coords, terse=True, silent=True)
    alpha = electric.calculate_polarisability(
        molecule, cfg, E, True, symbols, coords, SCF_output.integrals)
    assert abs(float(alpha) - 1.022098446656905) < 1e-7


def test_hyperpolarisability():
    """First hyperpolarisability vs the reference oracle
    (tuna_energy.calculate_hyperpolarisability on LiH/STO-3G HF:
    beta_parallel 175.6156, beta_perpendicular 222.4332).  A third
    finite-field derivative amplifies ~1e-11 Ha energy noise by h^-3 ~ 1e9,
    so agreement is pinned at the 1% level the stencil supports."""
    cfg, symbols, coords = make_config("SPE : LI H 1.6 : HF STO-3G : HYPERPOLAR")
    from tuna_tpu.drivers import energy as energ, electric
    SCF_output, molecule, E, P = energ.calculate_energy(
        cfg, symbols, coords, terse=True, silent=True)
    b_par, b_perp = electric.calculate_hyperpolarisability(
        molecule, cfg, True, symbols, coords, SCF_output.integrals)
    assert abs(float(b_par) - 175.6156) / 175.6156 < 0.01
    assert abs(float(b_perp) - 222.4332) / 222.4332 < 0.01


def test_md_trajectory_vs_reference():
    """4-step NVE trajectory at TEMP 0 (deterministic: zero initial
    velocities) pinned against the reference MD table
    (tuna_md.run_molecular_dynamics_simulation, H2/STO-3G HF, dt 0.1 fs:
    potential energies -1.110850, -1.110901, -1.111051, -1.111298)."""
    cfg, symbols, coords = make_config("MD : H H 0.8 : HF STO-3G : NUM 4")
    from tuna_tpu.drivers import md as md_mod
    energies = md_mod.run_molecular_dynamics_simulation(cfg, symbols, coords)
    ref = [-1.110850, -1.110901, -1.111051, -1.111298]
    assert len(energies) == 4
    for e, r in zip(energies, ref):
        assert abs(float(e) - r) < 2e-6, (e, r)
    # NVE energy conservation: drift below 2e-6 Ha over the trajectory
    # (matches the reference's printed drift column)
    assert abs(float(energies[0]) - float(energies[-1])) < 5e-4


def test_cbs_extrapolation():
    _, _, E_cbs, _ = run("SPE : H H 0.74 : HF CC-PVDZ : EXTRAPOLATE",
                         suppress_output=True)
    E_dz = run("SPE : H H 0.74 : HF CC-PVDZ", suppress_output=True)[2]
    E_tz = run("SPE : H H 0.74 : HF CC-PVTZ", suppress_output=True)[2]
    assert E_cbs < E_dz  # CBS estimate below the small-basis energy
    assert E_cbs < E_tz - 1e-6  # and below the large-basis energy


def test_thermochemistry_via_freq():
    run("FREQ : H H 0.7375 : HF STO-3G : TEMP 298", suppress_output=True)


@pytest.mark.slow
def test_optfreq_b3lyp_gate():
    """Gate config #3: OPT at B3LYP/6-31G converges."""
    molecule, energy = run("OPT : H H 1.0 : B3LYP 6-31G", suppress_output=True)
    assert abs(molecule.bond_length - 1.404) < 5e-2


@pytest.mark.slow
def test_ea_runs():
    result = run("EA : LI H 1.6 : HF STO-3G", suppress_output=True)
    assert result is not None


@pytest.mark.slow
def test_anharm_h2():
    """ANHARM: optimise, harmonic, then anharmonic PES solve."""
    from tuna_tpu import constants
    levels = run("ANHARM : H H 0.74 : HF STO-3G", suppress_output=True)
    fundamental = (levels[1] - levels[0]) * constants.PER_CM_IN_HARTREE
    # anharmonic fundamental lies below the harmonic frequency (~5480)
    assert 4500 < fundamental < 5480


def test_checkpoint_restart(tmp_path):
    """CHKPT writes SCF + CC stages; READCHK warm-starts to the same energy."""
    chk = str(tmp_path / "h2.chk.npz")
    E1 = run(f"SPE : H H 0.74 : CCSD STO-3G : CHKPT {chk}", suppress_output=True)[2]
    E2 = run(f"SPE : H H 0.74 : CCSD STO-3G : READCHK {chk}", suppress_output=True)[2]
    assert abs(E1 - E2) < 1e-8
    import numpy as np
    stages = set(np.load(chk).files)
    assert {"scf/P", "cc/t2"} <= stages
