"""Finite-difference stencil fast paths (SURVEY.md section 2.3 DP mapping):
on the multi-device virtual mesh, geometry stencils (five-point Hessian, VPT
window) and field stencils (polarisability / hyperpolarisability / numerical
multipoles) run as ONE sharded batched SCF solve and must reproduce the
serial walk the reference uses (tuna_opt.py:87-147, tuna_energy.py:315-759)."""

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


def _converged_state(line):
    from tuna_tpu.drivers import energy as energ
    cfg, symbols, coords = make_config(line)
    SCF_output, molecule, E, P = energ.calculate_energy(
        cfg, symbols, coords, terse=True, silent=True)
    return cfg, symbols, molecule, SCF_output, E


def test_batched_polarisability_matches_serial(monkeypatch):
    import jax
    from tuna_tpu.drivers import electric

    assert jax.device_count() >= 2
    # EXTREMESCF: the stencil divides tiny energy differences by h^2, so the
    # batched/serial comparison needs both walks converged well past default
    cfg, symbols, molecule, SCF_output, E = _converged_state(
        "SPE : H H 0.74 : HF STO-3G : EXTREMESCF")
    coords = molecule.coordinates

    args = (molecule, cfg, E, True, symbols, coords, SCF_output.integrals)
    alpha_batched = electric.calculate_polarisability(*args)

    monkeypatch.setattr(electric, "_prefetch_field_energies",
                        lambda *a, **k: None)
    alpha_serial = electric.calculate_polarisability(*args)
    assert abs(alpha_batched - alpha_serial) < 1e-5, (alpha_batched, alpha_serial)


def test_batched_dft_polarisability_matches_serial(monkeypatch):
    """DFT finite-field stencils ride the batch too: field_energies_parallel
    binds the single-geometry quadrature grid into the kernel's XC closure
    (round 4)."""
    import jax
    from tuna_tpu.drivers import electric

    assert jax.device_count() >= 2
    cfg, symbols, molecule, SCF_output, E = _converged_state(
        "SPE : H H 0.74 : PBE STO-3G : EXTREMESCF")
    coords = molecule.coordinates

    args = (molecule, cfg, E, True, symbols, coords, SCF_output.integrals)
    alpha_batched = electric.calculate_polarisability(*args)

    monkeypatch.setattr(electric, "_prefetch_field_energies",
                        lambda *a, **k: None)
    alpha_serial = electric.calculate_polarisability(*args)
    assert abs(alpha_batched - alpha_serial) < 1e-5, (alpha_batched, alpha_serial)


def test_batched_mp2_polarisability_matches_serial(monkeypatch):
    """Correlated finite-field stencils batch too: the per-field-point
    orbitals feed the vmapped MP2 correlation with the AO tensor broadcast
    (round 4)."""
    import jax
    from tuna_tpu.drivers import electric

    assert jax.device_count() >= 2
    cfg, symbols, molecule, SCF_output, E = _converged_state(
        "SPE : LI H 1.6 : MP2 STO-3G : EXTREMESCF")
    coords = molecule.coordinates

    args = (molecule, cfg, E, True, symbols, coords, SCF_output.integrals)
    alpha_batched = electric.calculate_polarisability(*args)

    monkeypatch.setattr(electric, "_prefetch_field_energies",
                        lambda *a, **k: None)
    alpha_serial = electric.calculate_polarisability(*args)
    assert abs(alpha_batched - alpha_serial) < 1e-5, (alpha_batched, alpha_serial)


def test_batched_quadrupole_matches_serial(monkeypatch):
    import jax
    from tuna_tpu.drivers import electric

    assert jax.device_count() >= 2
    cfg, symbols, molecule, SCF_output, E = _converged_state(
        "SPE : LI H 1.6 : HF STO-3G")
    coords = molecule.coordinates

    args = (molecule, cfg, True, symbols, coords, SCF_output.integrals)
    q_batched = electric.calculate_numerical_quadrupole_moment(*args)
    monkeypatch.setattr(electric, "_prefetch_field_energies",
                        lambda *a, **k: None)
    q_serial = electric.calculate_numerical_quadrupole_moment(*args)
    assert abs(q_batched - q_serial) < 1e-5, (q_batched, q_serial)


def test_batched_five_point_hessian_matches_serial(monkeypatch):
    import jax
    from tuna_tpu.drivers import opt

    assert jax.device_count() >= 2
    cfg, symbols, molecule, SCF_output, E = _converged_state(
        "SPE : H H 0.7375 : HF STO-3G")
    coords = molecule.coordinates

    h_batched, SCF_f, P_f, SCF_b, P_b, disp_batched = opt.calculate_hessian(
        coords, cfg, symbols, E, silent=True, allow_analytic=False)
    # batched path returns the displaced integrals containers for the
    # dipole-derivative stencil downstream
    assert SCF_f.integrals.D is not None

    monkeypatch.setattr(opt, "_batched_displaced_energies",
                        lambda *a, **k: None)
    h_serial, _, P_f_serial, _, _, disp_serial = opt.calculate_hessian(
        coords, cfg, symbols, E, silent=True, allow_analytic=False)

    assert abs(h_batched - h_serial) < 1e-6, (h_batched, h_serial)
    assert np.allclose(np.asarray(disp_batched), np.asarray(disp_serial),
                       atol=1e-8)
    assert np.max(np.abs(np.asarray(P_f) - np.asarray(P_f_serial))) < 1e-6


def test_vpt2_end_to_end_uses_batched_window():
    """FREQ + VPT2 (five-point Hessian + the +/-3h,4h window) runs end to end
    through the batched stencil paths on the mesh."""
    result = run("FREQ : H H 0.7375 : HF STO-3G : VPT2", suppress_output=True)
    assert result is not None
    _, _, freq_per_cm, zpe = result
    assert zpe > 0


def test_correlated_vpt_window_batches(monkeypatch):
    """Energy-only stencils (the VPT +/-3h,4h window, numerical gradients)
    batch CORRELATED methods too -- the batched energies must match the
    serial walk's correlated totals (round 4)."""
    import jax
    from tuna_tpu.drivers import opt

    assert jax.device_count() >= 2
    cfg, symbols, coords = make_config("SPE : LI H 1.6 : CCSD STO-3G : TIGHTSCF")
    h = 0.01
    batched = opt._batched_displaced_energies(
        np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.0]]), cfg, symbols,
        [-2 * h, -h, h, 2 * h], silent=True, energies_only=True)
    assert batched is not None, "correlated energy-only stencil must batch"
    energies = batched[0]

    from tuna_tpu.drivers import energy as energ
    for E_b, d in zip(energies[:2], (-2 * h, -h)):
        coords_d = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.0 + d]])
        _, _, E_s, _ = energ.evaluate_molecular_energy(
            cfg, symbols, coords_d, silent=True)
        assert abs(E_b - E_s) < 1e-8, (d, E_b, E_s)

    # densities-consuming stencils must NOT batch correlated methods
    assert opt._batched_displaced_energies(
        np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 3.0]]), cfg, symbols,
        [-h, h], silent=True) is None
