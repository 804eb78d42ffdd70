"""TPU verification of the dispatch-per-chunk f-shell ERI path.

The scanned sweep kills the TPU worker at lmax >= 3 (stage 8 of
tools/eri_fault_bisect.py) while the identical single-chunk program
passes; this script drives the dispatch-per-chunk path (the new default
for f shells on accelerators) at N2/cc-pVTZ and checks parity against
the host-CPU backend.  Every stage fsyncs to the log so a worker crash
still leaves a verdict.

Run:  timeout 3500 python tools/eri_dispatch_tpu_test.py
Log:  /tmp/eri_dispatch_tpu.log
"""
import os
import sys
import time

LOG = os.environ.get("ERI_DISPATCH_LOG", "/tmp/eri_dispatch_tpu.log")


def stage(msg):
    with open(LOG, "a") as fh:
        fh.write(f"{time.strftime('%H:%M:%S')} {msg}\n")
        fh.flush()
        os.fsync(fh.fileno())
    print(msg, flush=True)


def main():
    stage(f"=== dispatch test start pid={os.getpid()} ===")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    import numpy as np

    stage(f"backend={jax.default_backend()} devices={jax.devices()}")

    from tuna_tpu import constants as const
    from tuna_tpu.config import Config
    from tuna_tpu.methods import lookup_method
    from tuna_tpu.ops.integrals import IntegralPlan
    from tuna_tpu.system import Molecule

    cfg = Config("SPE", lookup_method("HF"), 0.0, [], "CC-PVTZ",
                 ["N", "N"], suppress_output=True)
    coords = np.array([[0.0, 0.0, 0.0],
                       [0.0, 0.0, const.angstrom_to_bohr(1.10)]])
    mol = Molecule(["N", "N"], coords, cfg)
    plan = IntegralPlan(mol.cartesian_basis_functions, mol.n_atoms)
    stage(f"plan: lmax={plan.lmax} npp={plan.n_prim_pairs} "
          f"T={plan.eri_row_chunk} block_pairs={plan.n_block_pairs} "
          f"n_pairs={plan.n_pairs} eri_pair is dispatch="
          f"{plan._eri_pair == plan._eri_pair_dispatch}")

    coords_dev = jnp.asarray(mol.coordinates)

    # Host-CPU oracle first (safe), so parity can be checked even if the
    # device stage crashes later runs.
    t0 = time.time()
    cpu_pair = jax.jit(plan._eri_pair_impl, backend="cpu")(coords_dev)
    cpu_pair = np.asarray(cpu_pair)
    stage(f"cpu oracle pair matrix done ({time.time()-t0:.1f}s, "
          f"[0,0]={cpu_pair[0,0]:.12e})")

    stage("DEVICE dispatch sweep (fault window)...")
    t0 = time.time()
    dev_pair = plan._eri_pair_dispatch(coords_dev)
    dev_pair.block_until_ready()
    t1 = time.time() - t0
    stage(f"device dispatch sweep done ({t1:.1f}s)")
    diff = float(jnp.abs(dev_pair - jnp.asarray(cpu_pair)).max())
    stage(f"parity max|dev-cpu| = {diff:.3e}")

    # Second run: everything compiled, measures the steady-state cost.
    t0 = time.time()
    dev_pair2 = plan._eri_pair_dispatch(coords_dev)
    dev_pair2.block_until_ready()
    stage(f"device dispatch sweep warm ({time.time()-t0:.1f}s)")

    # Direct-Fock dispatch on device
    rng = np.random.default_rng(0)
    P = rng.standard_normal((plan.n_basis, plan.n_basis))
    P = (P + P.T) / 2
    stage("DEVICE fock dispatch (fault window)...")
    t0 = time.time()
    Jd, Kd = plan._fock_direct_dispatch(coords_dev, jnp.asarray(P))
    Jd.block_until_ready()
    stage(f"device fock dispatch done ({time.time()-t0:.1f}s)")
    Jc, Kc = jax.jit(plan._fock_direct_impl, backend="cpu")(
        coords_dev, jnp.asarray(P))
    fdiff = max(float(jnp.abs(Jd - jax.device_put(Jc, jax.devices()[0])).max()),
                float(jnp.abs(Kd - jax.device_put(Kc, jax.devices()[0])).max()))
    stage(f"fock parity max|dev-cpu| = {fdiff:.3e}")

    ok = diff < 1e-10 and fdiff < 1e-9
    stage(f"=== dispatch test complete: {'PASS' if ok else 'FAIL'} ===")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
