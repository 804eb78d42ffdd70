"""Sub-stage bisect of the on-device f-shell ERI fault.

Round-4 triage (tools/eri_device_triage.py) narrowed the TPU worker crash
to the chunked quartet program: the one-electron kernel, boys_table and
build_scaled_Rz_table all pass standalone at lmax=3 sizes, but
`plan.eri_pair_packed` (and historically `plan.eri`) kill the worker.
This script runs each intermediate of `chunk_values` as its own jitted
call on REAL plan data for ONE row chunk, fetching a scalar after each, so
a crash identifies the faulting sub-stage exactly (the log survives).

Stages (env ERI_BISECT_START=<n> skips ahead after a crash/wedge):
  1  pair-data + ratio powers + g products
  2  Gx/Gy/Gz coupling einsums            (rct,rcu,tuT->rcT)
  3  axy pairing einsum                   (rcT,rcU,TUn->rcn)
  4  Rz table at full chunk width         (R*npp, 13, 13)
  5  total einsum                         (rcv,rcvn,rcn->rc)
  6  segment_sum column reduction
  7  one full chunk_values call
  8  full eri_pair_packed (scan over all chunks)

Run:   timeout 3500 python tools/eri_fault_bisect.py
Log:   /tmp/eri_bisect_r4.log
"""
import os
import sys
import time

STAGE_LOG = os.environ.get("ERI_BISECT_LOG", "/tmp/eri_bisect_r4.log")
START = int(os.environ.get("ERI_BISECT_START", "1"))

os.environ["TUNA_TPU_ERI_DEVICE"] = "1"


def stage(msg):
    with open(STAGE_LOG, "a") as fh:
        fh.write(f"{time.strftime('%H:%M:%S')} {msg}\n")
        fh.flush()
        os.fsync(fh.fileno())
    print(msg, flush=True)


def main():
    stage(f"=== bisect start pid={os.getpid()} from stage {START} ===")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    import numpy as np

    stage(f"backend={jax.default_backend()}")

    from tuna_tpu import constants as const
    from tuna_tpu.config import Config
    from tuna_tpu.methods import lookup_method
    from tuna_tpu.ops.integrals import IntegralPlan, build_scaled_Rz_table
    from tuna_tpu.system import Molecule

    cfg = Config("SPE", lookup_method("HF"), 0.0, [], "CC-PVTZ",
                 ["N", "N"], suppress_output=True)
    coords = np.array([[0.0, 0.0, 0.0],
                       [0.0, 0.0, const.angstrom_to_bohr(1.10)]])
    mol = Molecule(["N", "N"], coords, cfg)
    plan = IntegralPlan(mol.cartesian_basis_functions, mol.n_atoms)
    stage(f"plan: lmax={plan.lmax} npp={plan.n_prim_pairs} "
          f"R={plan.eri_row_chunk} n_pairs={plan.n_pairs}")

    coords_dev = jnp.asarray(mol.coordinates)
    lmax = plan.lmax
    tmax = 2 * lmax          # matches _sweep_blocks
    mmax = lmax
    nmax4 = 4 * lmax
    vmax4 = 2 * tmax

    # Host-side: stage ONE block pair of the parity-blocked sweep.  The
    # stages below rebuild the same intermediates on a (T, T) quartet block
    # (round 4 used a (R, npp) row chunk; the program class is identical).
    block_rows, block_values, dtype = plan._sweep_blocks(coords_dev)
    bp0 = plan._qt_block_pairs[0]
    row0 = jax.jit(block_rows)(np.int32(bp0[0]))
    col0 = jax.jit(block_rows)(np.int32(bp0[1]))
    R = plan.eri_row_chunk
    npp = plan.n_prim_pairs
    hx, hy, hz, p, Pz = plan._pair_data(coords_dev)
    # the stages' column arrays: the first block's gathered data
    p_cols = col0["p"]
    Pz_cols = col0["Pz"]
    hx_cols = col0["hx"]
    stage(f"block staged: T={R} npp={npp} tmax={tmax} nmax4={nmax4}")

    def fetch(x, label):
        t0 = time.time()
        v = float(jnp.asarray(x).ravel()[0])
        stage(f"{label} OK ({time.time()-t0:.1f}s, v0={v:.6e})")

    # --- stage 1: ratios + g products -------------------------------------
    def g_products(row):
        p12 = row["p"][:, None]
        q34 = p_cols[None, :]
        psum = p12 + q34
        ratio12 = q34 / psum
        sqrt_r12 = jnp.sqrt(ratio12)
        outs = [jnp.ones_like(sqrt_r12)]
        for _ in range(tmax):
            outs.append(outs[-1] * sqrt_r12)
        r12_half = jnp.stack(outs, axis=-1)
        gx12 = row["hx"][:, None, :] * r12_half
        return gx12.sum()

    if START <= 1:
        stage("stage1 g-products (fault window)...")
        fetch(jax.jit(g_products)(row0), "stage1")

    # --- stage 2: coupling einsums ----------------------------------------
    n2t = 2 * tmax
    conv_T = np.zeros((tmax + 1, tmax + 1, n2t + 1))
    for t in range(tmax + 1):
        for u in range(tmax + 1):
            conv_T[t, u, t + u] = 1.0
    conv_T = jnp.asarray(conv_T)

    def coupling(row):
        p12 = row["p"][:, None]
        q34 = p_cols[None, :]
        psum = p12 + q34
        sqrt_r12 = jnp.sqrt(q34 / psum)
        outs = [jnp.ones_like(sqrt_r12)]
        for _ in range(tmax):
            outs.append(outs[-1] * sqrt_r12)
        r12_half = jnp.stack(outs, axis=-1)
        gx12 = row["hx"][:, None, :] * r12_half
        gx34 = hx_cols[None, :, :] * r12_half  # same shapes as the real kernel
        return jnp.einsum("rct,rcu,tuT->rcT", gx12, gx34, conv_T)

    if START <= 2:
        stage("stage2 coupling einsum (fault window)...")
        fetch(jax.jit(lambda r: coupling(r).sum())(row0), "stage2")

    # --- stage 3: pairing einsum -------------------------------------------
    from tuna_tpu.ops.integrals import _double_factorial
    dfact = np.array([_double_factorial(2 * m - 1) for m in range(2 * mmax + 1)])
    pair_E = np.zeros((n2t + 1, n2t + 1, nmax4 + 1))
    for m1 in range(2 * mmax + 1):
        for m2 in range(2 * mmax + 1):
            if m1 + m2 <= nmax4:
                pair_E[2 * m1, 2 * m2, m1 + m2] = dfact[m1] * dfact[m2]
    pair_E = jnp.asarray(pair_E)

    def pairing(row):
        G = coupling(row)
        return jnp.einsum("rcT,rcU,TUn->rcn", G, G, pair_E)

    if START <= 3:
        stage("stage3 pairing einsum (fault window)...")
        fetch(jax.jit(lambda r: pairing(r).sum())(row0), "stage3")

    # --- stage 4: Rz table at full chunk width ------------------------------
    def rz_full(row):
        p12 = row["p"][:, None]
        q34 = p_cols[None, :]
        psum = p12 + q34
        alpha = p12 * q34 / psum
        PQz = row["Pz"][:, None] - Pz_cols[None, :]
        Rz = build_scaled_Rz_table(vmax4, nmax4, PQz.reshape(-1),
                                   alpha.reshape(-1))
        return Rz.sum()

    if START <= 4:
        stage("stage4 Rz table at (R*npp) width (fault window)...")
        fetch(jax.jit(rz_full)(row0), "stage4")

    # --- stage 5: the total einsum ------------------------------------------
    vn_mask = jnp.asarray(np.array([[1.0 if n <= nmax4 - V else 0.0
                                     for n in range(nmax4 + 1)]
                                    for V in range(vmax4 + 1)]))

    def total_einsum(row):
        p12 = row["p"][:, None]
        q34 = p_cols[None, :]
        psum = p12 + q34
        alpha = p12 * q34 / psum
        PQz = row["Pz"][:, None] - Pz_cols[None, :]
        Rz = build_scaled_Rz_table(vmax4, nmax4, PQz.reshape(-1),
                                   alpha.reshape(-1))
        Rz = Rz.reshape(PQz.shape + (vmax4 + 1, nmax4 + 1)) * vn_mask
        G = coupling(row)
        axy = pairing(row)
        total = jnp.einsum("rcv,rcvn,rcn->rc",
                           G[..., :vmax4 + 1], Rz, axy)
        return total

    if START <= 5:
        stage("stage5 total einsum (fault window)...")
        fetch(jax.jit(lambda r: total_einsum(r).sum())(row0), "stage5")

    # --- stage 6: segment_sum -----------------------------------------------
    def seg(row):
        vals = total_einsum(row)
        return jax.ops.segment_sum(vals.T, col0["pid"],
                                   num_segments=plan.n_pairs).T.sum()

    if START <= 6:
        stage("stage6 segment_sum (fault window)...")
        fetch(jax.jit(seg)(row0), "stage6")

    # --- stage 7: one real block_values -------------------------------------
    if START <= 7:
        stage("stage7 real block_values, one block pair (fault window)...")
        fetch(jax.jit(lambda r, c: block_values(r, c).sum())(row0, col0),
              "stage7")

    # --- stage 8: the full packed sweep --------------------------------------
    if START <= 8:
        stage("stage8 full eri_pair_packed (fault window)...")
        t0 = time.time()
        G_pair = plan.eri_pair_packed(coords_dev)
        fetch(G_pair[0, 0], "stage8")

    stage("=== bisect complete: all stages passed ===")
    return 0


if __name__ == "__main__":
    sys.exit(main())
