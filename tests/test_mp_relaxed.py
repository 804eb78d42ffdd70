"""Relaxed (Z-vector) MP2 density: the defining property of the response
density is that the analytic expectation value Tr(P D) equals the derivative
of the total energy with respect to an applied field.  This pins the whole
post.rpa Z-vector chain (Lagrangian assembly, (A+B) build, device solve)
without any reference data."""

import time

import numpy as np
import pytest

from tuna_tpu.cli import parse_input, process_method
from tuna_tpu.config import Config
from tuna_tpu.drivers.energy import calculate_energy


def _total_energy(line):
    calc_type, ms, basis, symbols, coords, params = parse_input(line)
    cfg = Config(calc_type, process_method(ms), time.time(), params, basis,
                 symbols, suppress_output=True)
    SCF_output, molecule, E, _ = calculate_energy(cfg, symbols, coords,
                                                  silent=True)
    return E, SCF_output, molecule, cfg, coords


def _field_expectation(line):
    """Tr(P Dz): the analytic derivative of the energy wrt the applied field
    (the field couples through exactly these dipole integrals in H_core)."""
    calc_type, ms, basis, symbols, coords, params = parse_input(line)
    cfg = Config(calc_type, process_method(ms), time.time(), params, basis,
                 symbols, suppress_output=True)
    SCF_output, molecule, E, P = calculate_energy(cfg, symbols, coords,
                                                  silent=True)
    Dz = np.asarray(SCF_output.integrals.D[2])
    return float(np.sum(np.asarray(P) * Dz))


def _field_derivative(base, h=2e-4):
    E_plus, *_ = _total_energy(base + f" EZ {h}")
    E_minus, *_ = _total_energy(base + f" EZ {-h}")
    return (E_plus - E_minus) / (2 * h)


@pytest.mark.slow
def test_relaxed_mp2_density_is_field_derivative():
    base = "SPE : H F 1.733 : MP2 6-31G : RELAXED TIGHTSCF"
    dEdF = _field_derivative(base)
    trPD = _field_expectation(base)
    assert abs(trPD - dEdF) < 5e-6, (
        f"relaxed MP2 Tr(P Dz) {trPD:.8f} vs field derivative {dEdF:.8f}")


@pytest.mark.slow
def test_unrelaxed_mp2_density_differs():
    """Sanity: the unrelaxed density must NOT satisfy the derivative property
    (if it did, the relaxed machinery would be vacuous)."""
    base = "SPE : H F 1.733 : MP2 6-31G : TIGHTSCF"
    dEdF = _field_derivative(base)
    trPD = _field_expectation(base)
    assert abs(trPD - dEdF) > 1e-3
