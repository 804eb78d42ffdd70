"""Staged triage of the on-device f-shell (lmax>=3) ERI kernel.

The TPU runtime previously crashed its worker on the ERI quartet kernel at
lmax >= 3 (reference computes every integral in its own engine,
tuna_integral.pyx:1267-1355; we fall back to the host CPU backend,
ops/integrals.py:236-274).  Round 3's tensorised coupling-tensor kernel
shrank the compiled program substantially and may already avoid the fault.

A crash wedges the remote-TPU tunnel for 20-60+ minutes, so each stage
flushes its verdict to STAGE_LOG *before* the next device call; if the
process dies mid-stage the log still records exactly how far it got.

Run:   timeout 900 python tools/eri_device_triage.py
Log:   /tmp/eri_triage_r4.log  (append-mode, survives the process)
"""
import os
import sys
import time

STAGE_LOG = os.environ.get("ERI_TRIAGE_LOG", "/tmp/eri_triage_r4.log")

os.environ["TUNA_TPU_ERI_DEVICE"] = "1"


def stage(msg):
    with open(STAGE_LOG, "a") as fh:
        fh.write(f"{time.strftime('%H:%M:%S')} {msg}\n")
        fh.flush()
        os.fsync(fh.fileno())
    print(msg, flush=True)


def main():
    stage(f"=== triage start pid={os.getpid()} ===")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import numpy as np

    stage(f"backend={jax.default_backend()} devices={jax.devices()}")
    if (jax.default_backend() == "cpu"
            and os.environ.get("ERI_TRIAGE_ALLOW_CPU") != "1"):
        stage("ABORT: need an accelerator backend for this triage")
        return 1

    from tuna_tpu import constants as const
    from tuna_tpu.config import Config
    from tuna_tpu.methods import lookup_method
    from tuna_tpu.ops.integrals import IntegralPlan
    from tuna_tpu.system import Molecule

    # N2 / cc-pVTZ: f functions on N -> lmax = 3, the faulting class.
    cfg = Config("SPE", lookup_method("HF"), 0.0, [], "CC-PVTZ",
                 ["N", "N"], suppress_output=True)
    coords = np.array([[0.0, 0.0, 0.0],
                       [0.0, 0.0, const.angstrom_to_bohr(1.10)]])
    mol = Molecule(["N", "N"], coords, cfg)
    stage(f"molecule built: {len(mol.cartesian_basis_functions)} cart AOs")

    plan = IntegralPlan(mol.cartesian_basis_functions, mol.n_atoms)
    stage(f"plan built: lmax={plan.lmax} n_prim_pairs={plan.n_prim_pairs} "
          f"row_chunk={plan.eri_row_chunk}")
    assert plan.lmax >= 3

    coords_dev = jax.numpy.asarray(mol.coordinates)

    # Stage 1: one-electron integrals on device (never faulted, sanity).
    t0 = time.time()
    S = plan.one_electron(coords_dev, mol.charges.astype(float),
                          mol.centre_of_mass)[0]
    s00 = float(S[0, 0])
    stage(f"stage1 one-electron OK ({time.time()-t0:.1f}s, S[0,0]={s00:.6f})")

    # Stage 1b/1c: the high-order helpers the ERI kernel needs beyond what
    # the (working) one-electron kernel exercises -- isolate the fault site.
    import jax.numpy as jnp
    from tuna_tpu.ops.boys import boys_table
    from tuna_tpu.ops.integrals import build_scaled_Rz_table

    nmax4 = 4 * plan.lmax
    t0 = time.time()
    Targ = jnp.linspace(0.0, 80.0, 4096, dtype=jnp.float64)
    F = jax.jit(lambda T: boys_table(nmax4, T))(Targ)
    f0 = float(F[0, 0])
    stage(f"stage1b boys_table(nmax={nmax4}) OK ({time.time()-t0:.1f}s, "
          f"F_0(0)={f0:.6f})")

    t0 = time.time()
    PQz = jnp.linspace(-3.0, 3.0, 4096, dtype=jnp.float64)
    alpha = jnp.linspace(0.3, 8.0, 4096, dtype=jnp.float64)
    Rz = jax.jit(lambda z, al: build_scaled_Rz_table(2 * nmax4 // 2, nmax4,
                                                     z, al))(PQz, alpha)
    r0 = float(Rz[0, 0, 0])
    stage(f"stage1c Rz table (vmax={nmax4}, nmax={nmax4}) OK "
          f"({time.time()-t0:.1f}s, Rz[0,0,0]={r0:.6f})")

    # Stage 2a: packed pair-matrix sweep (same quartet kernel core, smaller
    # output program than the dense N^4 expansion).
    stage("stage2a packed ERI sweep: compiling+running (fault window)...")
    t0 = time.time()
    G_pair = plan.eri_pair_packed(coords_dev)
    v = float(G_pair[0, 0])
    stage(f"stage2a packed ERI OK ({time.time()-t0:.1f}s, "
          f"G[0,0]={v:.10f})")

    # Stage 2: the full on-device ERI sweep -- the historical faulter.
    stage("stage2 on-device ERI sweep: compiling+running (fault window)...")
    t0 = time.time()
    eri = plan.eri(coords_dev)
    v = float(eri[0, 0, 0, 0])  # fetch forces execution through the tunnel
    stage(f"stage2 on-device ERI OK ({time.time()-t0:.1f}s, "
          f"eri[0,0,0,0]={v:.10f})")

    # Stage 3: parity vs the host CPU backend.
    stage("stage3 CPU-backend reference sweep...")
    cpu_eri = jax.jit(plan._eri_impl, backend="cpu")(coords_dev)
    delta = float(np.max(np.abs(np.asarray(eri) - np.asarray(cpu_eri))))
    stage(f"stage3 parity max|delta|={delta:.3e} "
          f"({'OK' if delta < 1e-10 else 'FAIL'})")

    # Stage 4: lmax=4 (g functions) -- H2/cc-pV5Z, the next order up; the
    # fallback gate covers ALL lmax >= 3, so flipping it needs evidence
    # beyond f shells.
    cfg5 = Config("SPE", lookup_method("HF"), 0.0, [], "CC-PV5Z",
                  ["H", "H"], suppress_output=True)
    coords5 = np.array([[0.0, 0.0, 0.0],
                        [0.0, 0.0, const.angstrom_to_bohr(0.74)]])
    mol5 = Molecule(["H", "H"], coords5, cfg5)
    plan5 = IntegralPlan(mol5.cartesian_basis_functions, mol5.n_atoms)
    stage(f"stage4 H2/cc-pV5Z plan: lmax={plan5.lmax} "
          f"n_prim_pairs={plan5.n_prim_pairs}")
    c5 = jax.numpy.asarray(mol5.coordinates)
    t0 = time.time()
    eri5 = plan5.eri(c5)
    v5 = float(eri5[0, 0, 0, 0])
    stage(f"stage4 on-device g-shell ERI OK ({time.time()-t0:.1f}s, "
          f"(0000)={v5:.10f})")
    cpu5 = jax.jit(plan5._eri_impl, backend="cpu")(c5)
    d5 = float(np.max(np.abs(np.asarray(eri5) - np.asarray(cpu5))))
    stage(f"stage4 parity max|delta|={d5:.3e} "
          f"({'OK' if d5 < 1e-10 else 'FAIL'})")

    ok = delta < 1e-10 and d5 < 1e-10
    stage("=== triage complete: on-device f/g-shell ERIs WORK ===" if ok
          else "=== triage complete: parity FAIL ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
