"""Run the reference TUNA (/root/reference/TUNA) as a numerical oracle.

The reference is pure Python + NumPy except for its Cython integral engine
(tuna_integrals/tuna_integral.pyx), which cannot be built here (no Cython).
This module installs a drop-in shim for that one module, backed by our own
independently-validated integral engine (tuna_tpu.ops.integrals, itself
parity-tested against the from-scratch NumPy oracle in
tests/oracle_integrals.py).  Everything downstream of the integrals --
SCF, DFT, MPn, CC, CI, properties -- then runs the reference's own code,
giving true reference energies to pin parity tests and benchmarks against.

Usage:
    from tools.reference_oracle import reference_energy
    E = reference_energy("SPE : H H 0.74 : HF STO-3G")
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference/TUNA"

_plan_cache: dict = {}


def _bf_signature(bfs):
    parts = []
    for bf in bfs:
        parts.append((tuple(np.asarray(bf.shell)), tuple(np.round(np.asarray(bf.exps), 12)),
                      tuple(np.round(np.asarray(bf.origin), 10))))
    return tuple(parts)


def _install_shim():
    if "tuna_integrals.tuna_integral" in sys.modules:
        return
    from tuna_tpu.system import BasisFunction, normalise_contracted
    from tuna_tpu.ops.integrals import IntegralPlan, cross_overlap

    class Basis:
        """Pure-Python stand-in for the Cython Basis cdef class (pyx:78-234)."""

        def __init__(self, origin, shell, num_exps, exps, coefs):
            self.origin = np.asarray(origin, dtype=np.float64)
            self.shell = np.asarray(shell, dtype=np.int64)
            self.num_exps = int(num_exps)
            lmn = tuple(int(x) for x in self.shell)
            e, c, n = normalise_contracted(lmn, exps, coefs)
            self.exps, self.coefs, self.norm = e, c, n

    def _origins_to_atoms(bfs):
        origins = []
        index = []
        for bf in bfs:
            o = np.asarray(bf.origin, dtype=np.float64)
            for k, known in enumerate(origins):
                if np.allclose(known, o, atol=1e-12):
                    index.append(k)
                    break
            else:
                origins.append(o)
                index.append(len(origins) - 1)
        return origins, index

    def _convert(bfs, atom_index):
        out = []
        for bf, idx in zip(bfs, atom_index):
            lmn = tuple(int(x) for x in np.asarray(bf.shell))
            out.append(BasisFunction(np.asarray(bf.origin, dtype=np.float64), lmn,
                                     np.asarray(bf.exps, dtype=np.float64),
                                     np.asarray(bf.coefs, dtype=np.float64),
                                     np.asarray(bf.norm, dtype=np.float64), idx))
        return out

    def _plan_for(bfs, n_atoms):
        key = (_bf_signature(bfs), n_atoms)
        if key not in _plan_cache:
            origins, atom_index = _origins_to_atoms(bfs)
            converted = _convert(bfs, atom_index)
            _plan_cache[key] = (IntegralPlan(converted, n_atoms), origins, converted)
        return _plan_cache[key]

    def calculate_one_electron_integrals(n_basis, basis_functions, n_atoms, atoms,
                                         dipole_origin, num_threads):
        charges = np.array([float(a.charge) for a in atoms])
        coords = np.stack([np.asarray(a.origin, dtype=np.float64) for a in atoms])
        plan, _, _ = _plan_for(basis_functions, len(atoms))
        S, T, V, D, Q = plan.one_electron(coords, charges,
                                          float(np.asarray(dipole_origin)[2]))
        return (np.asarray(S), np.asarray(T), np.asarray(V),
                np.asarray(D), np.asarray(Q))

    def calculate_electron_repulsion_integrals(n_basis, ERI_AO, bfs, num_threads):
        plan, origins, _ = _plan_for(bfs, len(origins_of(bfs)))
        coords = np.stack(origins)
        return np.asarray(plan.eri(coords))

    def origins_of(bfs):
        origins, _ = _origins_to_atoms(bfs)
        return origins

    def calculate_cross_basis_overlap_matrix(n1, n2, bfs_1, bfs_2, num_threads):
        _, idx1 = _origins_to_atoms(bfs_1)
        _, idx2 = _origins_to_atoms(bfs_2)
        return cross_overlap(_convert(bfs_1, idx1), _convert(bfs_2, idx2))

    shim = types.ModuleType("tuna_integrals.tuna_integral")
    shim.Basis = Basis
    shim.calculate_one_electron_integrals = calculate_one_electron_integrals
    shim.calculate_electron_repulsion_integrals = calculate_electron_repulsion_integrals
    shim.calculate_cross_basis_overlap_matrix = calculate_cross_basis_overlap_matrix

    package = types.ModuleType("tuna_integrals")
    package.tuna_integral = shim
    sys.modules["tuna_integrals"] = package
    sys.modules["tuna_integrals.tuna_integral"] = shim


def load_reference():
    """Import the reference modules (with the integral shim active)."""
    _install_shim()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import tuna  # noqa: F401 (reference entry module)
    import tuna_energy  # noqa: F401
    return sys.modules["tuna"], sys.modules["tuna_energy"]


def reference_calculation(input_line: str):
    """Parse a reference-format input line into its Calculation object."""
    tuna, _ = load_reference()
    (calculation_type, method_string, basis, atomic_symbols, coordinates,
     params) = tuna.parse_input(input_line)
    method = tuna.process_method(method_string)
    from tuna_calc import Calculation
    calculation = Calculation(calculation_type, method, 0.0, params, basis,
                              atomic_symbols, True)
    return calculation, atomic_symbols, coordinates


def reference_energy(input_line: str) -> float:
    """Single-point energy from the reference code (SPE lines only)."""
    _, tuna_energy = load_reference()
    calculation, atomic_symbols, coordinates = reference_calculation(input_line)
    result = tuna_energy.evaluate_molecular_energy(
        calculation, atomic_symbols, coordinates, terse=True, silent=True)
    return float(result[2])
