"""Multi-device data parallelism: a sharded batched PES scan on the 8-device
virtual CPU mesh must reproduce the serial single-point energies."""

import time

import numpy as np
import pytest

from tuna_tpu.cli import parse_input, process_method, run
from tuna_tpu.config import Config


@pytest.mark.smoke
def test_sharded_scan_matches_serial():
    import jax
    from tuna_tpu import parallel

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    mesh = parallel.device_mesh(8)

    ct, ms, basis, symbols, coords, params = parse_input("SPE : H H 0.74 : HF STO-3G : EXTREMESCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)

    bond_lengths = np.linspace(1.2, 1.9, 8)
    energies, converged = parallel.scan_energies_parallel(cfg, symbols,
                                                          bond_lengths, mesh)
    assert converged.all()

    for R, E_batch in zip(bond_lengths[:3], energies[:3]):
        line = f"SPE : H H {R * 0.529177210544:.12f} : HF STO-3G : EXTREMESCF"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-8, (R, E_batch, E_serial)


@pytest.mark.smoke
def test_scan_driver_takes_parallel_fast_path():
    """The production SCAN driver must route plain-HF scans through the
    sharded batch on a multi-device host and reproduce serial SPE energies
    and analytic dipoles."""
    bond_lengths, energies, dipoles = run(
        "SCAN : H F 0.80 : HF STO-3G : NUM 6 STEP 0.07 TIGHTSCF",
        suppress_output=True)
    assert len(energies) == 6
    for R, E_scan in zip(bond_lengths[:3], energies[:3]):
        line = f"SPE : H F {R * 0.529177210544:.12f} : HF STO-3G : TIGHTSCF"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_scan - E_serial) < 1e-8, (R, E_scan, E_serial)
    # HF is polar: the analytic dipoles must be real numbers, not zeros
    assert all(abs(d) > 0.1 for d in dipoles)


@pytest.mark.parametrize("method_basis,kw,system,bonds", [
    ("B3LYP STO-3G", "TIGHTSCF", "H H", (1.2, 1.9)),          # hybrid GGA
    ("TPSS STO-3G", "TIGHTSCF", "H H", (1.2, 1.9)),           # meta-GGA (tau)
    ("UB3LYP STO-3G", "CH 1 ML 2 TIGHTSCF", "LI H", (2.6, 3.3)),  # unrestricted
    ("B3LYP STO-3G", "NL TIGHTSCF", "H H", (1.2, 1.9)),       # + VV10 batch
])
def test_sharded_dft_scan_matches_serial(method_basis, kw, system, bonds):
    """DFT rides the sharded batch: per-geometry quadrature grids are
    stacked along the batch axis and consumed by one vmapped SCF kernel
    (parallel._solve_points), reproducing serial single points."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        f"SPE : {system} 1.0 : {method_basis} : {kw}")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    R_batch = np.linspace(*bonds, 8)
    energies, converged = parallel.scan_energies_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    for R, E_batch in zip(R_batch[:2], energies[:2]):
        line = (f"SPE : {system} {R * 0.529177210544:.12f} : "
                f"{method_basis} : {kw}")
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-9, (R, E_batch, E_serial)


def test_sharded_double_hybrid_scan_matches_serial():
    """Double hybrids batch as sharded DFT SCF + the vmapped MP2 stage
    scaled by the functional's MPC coefficient (parallel.dh_scan_batchable);
    serial counterpart drivers/post_scf.py:120-127."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        "SPE : H H 1.0 : B2PLYP STO-3G : TIGHTSCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert parallel.dh_scan_batchable(cfg, symbols)
    R_batch = np.linspace(1.2, 1.9, 8)
    energies, converged = parallel.scan_energies_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    for R, E_batch in zip(R_batch[:2], energies[:2]):
        line = (f"SPE : H H {R * 0.529177210544:.12f} : "
                f"B2PLYP STO-3G : TIGHTSCF")
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-9, (R, E_batch, E_serial)


def test_sharded_scan_includes_dispersion():
    """Regression: the batch path must add the per-point D2 dispersion term
    (it was silently dropped -- the fast-path gate admitted D2 scans but
    scan_points_parallel only added nuclear repulsion)."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        "SPE : LI H 1.6 : HF STO-3G : D2 TIGHTSCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    R_batch = np.linspace(2.6, 3.0, 8)
    energies, converged = parallel.scan_energies_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    line = f"SPE : LI H {R_batch[0] * 0.529177210544:.12f} : HF STO-3G : D2 TIGHTSCF"
    E_serial = run(line, suppress_output=True)[2]
    assert abs(energies[0] - E_serial) < 1e-9, (energies[0], E_serial)


@pytest.mark.parametrize("method,kw", [
    ("MP2", "TIGHTSCF"),
    ("SCS-MP2", "TIGHTSCF"),
    ("MP2", "TIGHTSCF FREEZECORE"),
    ("MP3", "TIGHTSCF"),
    ("MP4", "TIGHTSCF"),
])
def test_sharded_mp2_scan_matches_serial(method, kw):
    """Restricted MP2/SCS-MP2 scans ride the batch: the batched SCF returns
    per-point orbitals and a second vmapped call adds the closed-form
    correlation energy (parallel._batched_restricted_mp2)."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        f"SPE : LI H 1.5 : {method} 6-31G : {kw}")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert parallel.mp2_scan_batchable(cfg, symbols)
    R_batch = np.linspace(2.6, 3.3, 8)
    energies, converged, _ = parallel.scan_points_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    for R, E_batch in zip(R_batch[:2], energies[:2]):
        line = f"SPE : LI H {R * 0.529177210544:.12f} : {method} 6-31G : {kw}"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-8, (R, E_batch, E_serial)


def test_mp2_scan_gate_rejects_uhf():
    """Spin-orbital (UHF-reference) MP2 must stay on the serial path."""
    from tuna_tpu import parallel
    ct, ms, basis, symbols, coords, params = parse_input(
        "SPE : LI H 1.5 : MP2 6-31G : CH 1 ML 2 TIGHTSCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert not parallel.mp2_scan_batchable(cfg, symbols)


@pytest.mark.parametrize("method,kw", [
    ("CCSD", "TIGHTSCF"),
    ("CCSD[T]", "TIGHTSCF"),          # perturbative triples batch too
    ("CCD", "TIGHTSCF FREEZECORE"),
])
def test_sharded_cc_scan_matches_serial(method, kw):
    """Restricted CC/CI scans ride the batch: the amplitude while_loop is
    vmapped over the geometry batch (parallel._batched_restricted_cc), with
    (T) as a pure per-point correction on the converged amplitudes."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        f"SPE : LI H 1.5 : {method} 6-31G : {kw}")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert parallel.cc_scan_batchable(cfg, symbols)
    R_batch = np.linspace(2.6, 3.3, 8)
    energies, converged, _ = parallel.scan_points_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    for R, E_batch in zip(R_batch[:2], energies[:2]):
        line = f"SPE : LI H {R * 0.529177210544:.12f} : {method} 6-31G : {kw}"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-8, (R, E_batch, E_serial)


@pytest.mark.parametrize("method_basis", ["MP2 6-31G", "CCSD[T] STO-3G"])
def test_sharded_uhf_correlated_scan_matches_serial(method_basis):
    """Open-shell (UHF-reference) MP2/CC scans batch through the vmapped
    spin-orbital pipeline (parallel._batched_unrestricted_corr)."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        f"SPE : LI H 1.5 : {method_basis} : CH 1 ML 2 TIGHTSCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert (parallel.ump2_scan_batchable(cfg, symbols)
            or parallel.ucc_scan_batchable(cfg, symbols))
    R_batch = np.linspace(2.8, 3.5, 8)
    energies, converged, _ = parallel.scan_points_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    line = (f"SPE : LI H {R_batch[0] * 0.529177210544:.12f} : "
            f"{method_basis} : CH 1 ML 2 TIGHTSCF")
    E_serial = run(line, suppress_output=True)[2]
    assert abs(energies[0] - E_serial) < 1e-8, (energies[0], E_serial)


@pytest.mark.parametrize("method", ["HF", "MP2"])
def test_sharded_cbs_scan_matches_serial(method):
    """EXTRAPOLATE scans batch as two sharded basis passes plus the
    per-point CBS formula (parallel.cbs_scan_points_parallel)."""
    import jax
    from tuna_tpu import parallel

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    ct, ms, basis, symbols, coords, params = parse_input(
        f"SPE : H H 0.74 : {method} CC-PVDZ : EXTRAPOLATE TIGHTSCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    assert parallel.cbs_scan_batchable(cfg, symbols)
    R_batch = np.linspace(1.2, 1.9, 8)
    energies, converged, _ = parallel.cbs_scan_points_parallel(
        cfg, symbols, R_batch, parallel.device_mesh())
    assert converged.all()
    line = (f"SPE : H H {R_batch[0] * 0.529177210544:.12f} : "
            f"{method} CC-PVDZ : EXTRAPOLATE TIGHTSCF")
    E_serial = run(line, suppress_output=True)[2]
    assert abs(energies[0] - E_serial) < 1e-8, (energies[0], E_serial)


def test_scan_driver_takes_parallel_fast_path_dft():
    """The production SCAN driver routes pure/hybrid DFT scans through the
    sharded batch on a multi-device host and reproduces serial SPE energies."""
    bond_lengths, energies, dipoles = run(
        "SCAN : H H 0.80 : PBE STO-3G : NUM 6 STEP 0.07 TIGHTSCF",
        suppress_output=True)
    assert len(energies) == 6
    for R, E_scan in zip(bond_lengths[:2], energies[:2]):
        line = f"SPE : H H {R * 0.529177210544:.12f} : PBE STO-3G : TIGHTSCF"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_scan - E_serial) < 1e-9, (R, E_scan, E_serial)


@pytest.mark.smoke
def test_sharded_fock_build_matches_dense():
    """ERI sharded over 8 chips: J/K from shard_map + all_gather match the
    single-device einsums."""
    import jax
    import jax.numpy as jnp
    from tuna_tpu import parallel
    from tuna_tpu.scf import coulomb_matrix, exchange_matrix

    rng = np.random.default_rng(0)
    n = 16
    A = rng.standard_normal((n, n, n, n))
    # 8-fold permutational symmetry like a real ERI
    ERI = A + A.transpose(1, 0, 2, 3) + A.transpose(0, 1, 3, 2) + A.transpose(1, 0, 3, 2)
    ERI = ERI + ERI.transpose(2, 3, 0, 1)
    P = rng.standard_normal((n, n))
    P = P + P.T

    mesh = parallel.device_mesh(8, axis="tp")
    J, K = parallel.fock_build_sharded(jnp.asarray(ERI), jnp.asarray(P), mesh)
    J_ref = coulomb_matrix(jnp.asarray(P), jnp.asarray(ERI))
    K_ref = exchange_matrix(jnp.asarray(P), jnp.asarray(ERI))
    assert np.max(np.abs(np.asarray(J) - np.asarray(J_ref))) < 1e-10
    assert np.max(np.abs(np.asarray(K) - np.asarray(K_ref))) < 1e-10


def test_auto_tp_mesh_thresholds(monkeypatch):
    """auto_tp_mesh fires only above the per-device HBM budget."""
    from tuna_tpu import parallel

    monkeypatch.setenv("TUNA_TPU_HBM_BUDGET_BYTES", "1e6")
    assert parallel.auto_tp_mesh(5e5) is None
    mesh = parallel.auto_tp_mesh(2e6)
    assert mesh is not None and len(mesh.devices.flat) == 8
    assert mesh.axis_names == ("tp",)


def test_tp_production_routing_matches_serial(monkeypatch):
    """With the HBM budget forced low, the stored-ERI SCF shards its
    two-electron tensor (parallel.fock_build_sharded) and the DIRECT MP2
    routes its MO transform through pair_packed_to_mo_sharded -- the
    production tensor-parallel paths -- and both match the serial result."""
    from tuna_tpu.cli import run
    from tuna_tpu.drivers import common
    from tuna_tpu.scf import _KERNEL_CACHE

    monkeypatch.setenv("TUNA_TPU_HBM_BUDGET_BYTES", "1000")
    E_tp_scf = run("SPE : N N 1.1 : HF 6-31G : TIGHTSCF",
                   suppress_output=True)[2]
    E_tp_mp2 = run("SPE : N N 1.1 : MP2 6-31G : DIRECT TIGHTSCF",
                   suppress_output=True)[2]
    monkeypatch.delenv("TUNA_TPU_HBM_BUDGET_BYTES")
    E_scf = run("SPE : N N 1.1 : HF 6-31G : TIGHTSCF",
                suppress_output=True)[2]
    E_mp2 = run("SPE : N N 1.1 : MP2 6-31G : DIRECT TIGHTSCF",
                suppress_output=True)[2]
    assert abs(float(E_tp_scf) - float(E_scf)) < 1e-9
    assert abs(float(E_tp_mp2) - float(E_mp2)) < 1e-9
