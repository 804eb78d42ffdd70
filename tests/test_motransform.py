"""Transform-direct AO -> MO integrals (ops/motransform.py): the packed
pair-matrix double half-transform must reproduce the dense O(N^5) transform,
serially and sharded over the virtual device mesh, and the DIRECT keyword's
correlated path must reproduce stored-tensor energies end-to-end."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuna_tpu.cli import parse_input, process_method, run
from tuna_tpu.config import Config
from tuna_tpu.ops import motransform
from tuna_tpu.ops.integrals import IntegralPlan
from tuna_tpu.system import Molecule


def _system(line, R_bohr=1.8):
    ct, ms, basis, symbols, _, params = parse_input(line)
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, R_bohr]])
    mol = Molecule(list(symbols), coords, cfg)
    plan = IntegralPlan(mol.cartesian_basis_functions, mol.n_atoms)
    return plan, mol, jnp.asarray(coords)


@pytest.mark.parametrize("line", [
    "SPE : H H 0.74 : HF 6-31G",
    "SPE : N N 1.1 : HF 6-31G",      # s, p shells
])
def test_packed_transform_matches_dense(line):
    from tuna_tpu.post.transforms import ao_to_mo_chemists

    plan, mol, coords = _system(line)
    N = plan.n_basis
    rng = np.random.RandomState(7)
    # random orthonormal-ish MO coefficients over the CARTESIAN basis
    W = jnp.asarray(rng.randn(N, N) / np.sqrt(N))

    dense = ao_to_mo_chemists(plan.eri(coords), W)
    G_mo = motransform.pair_packed_to_mo(
        plan.eri_pair_packed(coords), jnp.asarray(plan.pair_index), W, N)
    packed_expanded = motransform.expand_mo_chemists(G_mo, N)
    assert np.max(np.abs(np.asarray(packed_expanded - dense))) < 1e-10, line


def test_packed_transform_chunking_invariant():
    plan, mol, coords = _system("SPE : N N 1.1 : HF STO-3G")
    N = plan.n_basis
    rng = np.random.RandomState(11)
    W = jnp.asarray(rng.randn(N, N))
    G_pair = plan.eri_pair_packed(coords)
    pidx = jnp.asarray(plan.pair_index)
    a = motransform.pair_packed_to_mo(G_pair, pidx, W, N, row_chunk=128)
    b = motransform.pair_packed_to_mo(G_pair, pidx, W, N, row_chunk=7)
    assert np.max(np.abs(np.asarray(a - b))) < 1e-11


def test_mixed_packed_transform_matches_dense():
    """Mixed-coefficient transform (left pair W_a, right pair W_b) -- the
    UHF-reference DIRECT path's (alpha alpha | beta beta) block."""
    plan, mol, coords = _system("SPE : N N 1.1 : HF STO-3G")
    N = plan.n_basis
    rng = np.random.RandomState(23)
    Wa = jnp.asarray(rng.randn(N, N) / np.sqrt(N))
    Wb = jnp.asarray(rng.randn(N, N) / np.sqrt(N))
    dense = jnp.einsum("ijkl,ir,js,kp,lq->rspq", plan.eri(coords),
                       Wa, Wa, Wb, Wb, optimize=True)
    G = motransform.pair_packed_to_mo_mixed(
        plan.eri_pair_packed(coords), jnp.asarray(plan.pair_index), Wa, Wb, N)
    got = motransform.expand_mo_chemists(G, N)
    assert np.max(np.abs(np.asarray(got - dense))) < 1e-10


def test_direct_so_transform_matches_spin_block():
    """transform_direct_so_physicists must reproduce the stored-tensor
    spin-orbital <pq|rs> (spin_block_eri + ao_to_so_physicists) exactly,
    including the energy-sorted orbital interleaving."""
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms

    line = "SPE : LI H 1.6 : UHF STO-3G : CH 1 ML 2 TIGHTSCF"
    ct, ms, basis, symbols, coords, params = parse_input(line)
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)
    SCF_output, molecule, _, _ = calculate_energy(cfg, symbols, coords,
                                                  silent=True,
                                                  do_correlation=False)
    integrals = SCF_output.integrals

    ERI_sb = transforms.spin_block_eri(jnp.asarray(integrals.ERI_AO))
    C_sb = transforms.spin_block_orbitals(
        SCF_output.molecular_orbitals_alpha,
        SCF_output.molecular_orbitals_beta, SCF_output.epsilons_combined)
    want = transforms.ao_to_so_physicists(ERI_sb, C_sb, C_sb)
    got = transforms.transform_direct_so_physicists(molecule, SCF_output, cfg)
    assert np.max(np.abs(np.asarray(got - want))) < 1e-10


def test_sharded_transform_matches_serial():
    """The mesh-sharded two-phase transform (row-shard, all_to_all,
    column-shard) must agree with the serial packed transform."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from jax.sharding import Mesh

    plan, mol, coords = _system("SPE : N N 1.1 : HF STO-3G")
    N = plan.n_basis
    n_dev = jax.device_count()
    rng = np.random.RandomState(13)
    W = jnp.asarray(rng.randn(N, N))
    G_pair = plan.eri_pair_packed(coords)
    pidx = jnp.asarray(plan.pair_index)

    n_mo_pairs = N * (N + 1) // 2
    assert n_mo_pairs % n_dev != 0, "also exercises the PQ-axis padding"

    serial = motransform.pair_packed_to_mo(G_pair, pidx, W, N)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    sharded = motransform.pair_packed_to_mo_sharded(G_pair, pidx, W, N, mesh)
    # both packed matrices represent the symmetric (pq|rs); orientations may
    # be transposed relative to each other
    diff = min(np.max(np.abs(np.asarray(sharded) - np.asarray(serial))),
               np.max(np.abs(np.asarray(sharded).T - np.asarray(serial))))
    assert diff < 1e-10


@pytest.mark.parametrize("line_pair", [
    ("SPE : N N 1.1 : MP2 6-31G : TIGHTSCF",
     "SPE : N N 1.1 : MP2 6-31G : DIRECT TIGHTSCF"),
    ("SPE : LI H 1.6 : CCSD STO-3G : TIGHTSCF",
     "SPE : LI H 1.6 : CCSD STO-3G : DIRECT TIGHTSCF"),
    # UHF-reference (spin-orbital) CC through transform_direct_so_physicists
    ("SPE : LI H 1.6 : UCCSD 6-31G : CH 1 ML 2 TIGHTSCF",
     "SPE : LI H 1.6 : UCCSD 6-31G : CH 1 ML 2 DIRECT TIGHTSCF"),
    ("SPE : LI H 1.6 : UCCSD[T] STO-3G : CH 1 ML 2 TIGHTSCF",
     "SPE : LI H 1.6 : UCCSD[T] STO-3G : CH 1 ML 2 DIRECT TIGHTSCF"),
])
def test_direct_correlated_matches_stored(line_pair):
    """End-to-end: DIRECT + correlated method (integral-direct SCF, then the
    transform-direct MO tensor) reproduces the stored-tensor energy."""
    stored, direct = line_pair
    E_stored = run(stored, suppress_output=True)[2]
    E_direct = run(direct, suppress_output=True)[2]
    assert abs(E_stored - E_direct) < 1e-9, (E_stored, E_direct)


@pytest.mark.slow
def test_direct_ccsd_cc_pvqz_matches_stored():
    """CCSD/cc-pVQZ H2 (lmax=3, v=59): the transform-direct MO path at a
    correlated large-ish basis reproduces the stored-tensor energy.  This is
    the CPU-sized stand-in for the cc-pV5Z+ HBM story (BASELINE.md Manual
    section 7.2): under DIRECT the N^4 AO tensor is never materialised.
    Measured 2026-08-18 on this box: stored 66 s, direct 348 s,
    delta 3.6e-15 Ha."""
    stored = run("SPE : H H 0.74 : CCSD CC-PVQZ : TIGHTSCF",
                 suppress_output=True)[2]
    direct = run("SPE : H H 0.74 : CCSD CC-PVQZ : DIRECT TIGHTSCF",
                 suppress_output=True)[2]
    assert abs(stored - direct) < 1e-10, (stored, direct)


@pytest.mark.slow
def test_sharded_transform_cc_pv6z_shapes():
    """cc-pV6Z H2 SHAPE validation of the sharded transform on the virtual
    mesh (N_cart = 252, n_ao_pairs = 31878, n_mo = 182 spherical): no
    replicated N^4-scale array, entries verified against direct
    contractions of the packed AO matrix.  Run in f32 to keep the CPU-mesh
    runtime sane -- the sharding arithmetic is dtype-independent.  NOTE:
    ~14 min on this box's single CPU core (measured 828 s); the virtual
    mesh serialises all 8 shards onto one core."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from jax.sharding import Mesh

    N_cart, n_mo = 252, 182
    n_pairs = N_cart * (N_cart + 1) // 2
    n_mo_pairs = n_mo * (n_mo + 1) // 2          # 16653
    n_dev = jax.device_count()

    pair_index = np.zeros((N_cart, N_cart), dtype=np.int64)
    tr, tc = np.tril_indices(N_cart)
    pair_index[tr, tc] = pair_index[tc, tr] = np.arange(n_pairs)

    rng = np.random.RandomState(17)
    G_pair = rng.rand(n_pairs, n_pairs).astype(np.float32)
    G_pair = (G_pair + G_pair.T) / 2              # chemists' 12<->34 symmetry
    W = (rng.randn(N_cart, n_mo) / np.sqrt(N_cart)).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    G_mo = np.asarray(motransform.pair_packed_to_mo_sharded(
        jnp.asarray(G_pair), jnp.asarray(pair_index), jnp.asarray(W),
        n_mo, mesh, row_chunk=256))
    assert G_mo.shape == (n_mo_pairs, n_mo_pairs)

    # spot-verify entries against the independent bilinear form:
    # G_mo[(pq),(rs)] = a_pq^T G_pair a_rs with a_pq[pair_kl] the packed
    # coefficient vector W[k,p]W[l,q] (+ the k!=l mirror term)
    def coeff_vector(p, q):
        outer = np.outer(W[:, p], W[:, q])
        sym = outer + outer.T
        a = sym[tr, tc]
        a[tr == tc] /= 2.0
        return a

    mo_tr, mo_tc = np.tril_indices(n_mo)
    for flat in (0, 5000, n_mo_pairs - 1):
        for flat2 in (1, n_mo_pairs // 2):
            p, q = int(mo_tr[flat]), int(mo_tc[flat])
            r, s = int(mo_tr[flat2]), int(mo_tc[flat2])
            want = coeff_vector(r, s) @ G_pair @ coeff_vector(p, q)
            got = G_mo[flat2, flat]
            assert abs(want - got) < 5e-2 * max(1.0, abs(want)), (
                (p, q, r, s, want, got))
