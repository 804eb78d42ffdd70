"""Minimal standalone repro of the TPU-worker crash in scanned ERI sweeps.

Context (PERF.md, tools/eri_fault_bisect.py): on the axon-tunneled TPU v5e,
the quartet-sweep program class -- a `lax.scan` over row chunks whose body
runs an unrolled f64 recurrence (the scaled Hermite/Boys Rz table) followed
by several einsums and a segment-sum -- deterministically kills the TPU
worker process at cc-pVTZ-like sizes (f shells, lmax=3).  Every sub-stage
of the body passes when jitted standalone, and the IDENTICAL body driven
chunk-by-chunk from Python (one jitted dispatch per chunk) runs fine; only
the scan-wrapped composition faults.  This script reproduces that contrast
with NO tuna_tpu imports so it can accompany an upstream report.

DANGER: on this development box a worker crash wedges the remote-execution
tunnel for 20-60+ minutes.  Do not run with --mode scan while other TPU
work is pending.

Usage:
    python tools/scan_fault_repro.py --mode dispatch   # known-good baseline
    python tools/scan_fault_repro.py --mode scan       # faulting class

Shrink knobs for bisecting the minimal trigger:
    --chunks N     number of scanned chunks        (default 72)
    --width T      rows per chunk                  (default 346)
    --vmax V       recursion depth (2*tmax)        (default 24; lmax=3)
    --no-recur     replace the Rz recurrence with a broadcasted power table
    --no-einsum    replace the coupling einsums with elementwise products
"""
import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["dispatch", "scan"], default="dispatch")
    ap.add_argument("--chunks", type=int, default=72)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--vmax", type=int, default=24)
    ap.add_argument("--no-recur", action="store_true")
    ap.add_argument("--no-einsum", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"mode={args.mode} chunks={args.chunks} width={args.width} "
          f"vmax={args.vmax}", flush=True)

    T = args.width
    vmax = args.vmax
    nmax = vmax                     # Boys-order cap, as in the real sweep
    kp = 4                          # packed x/y Hermite entries at lmax=3
    NB = args.chunks

    rng = np.random.default_rng(0)
    npp = NB * T
    # Synthetic "pair" data with the real sweep's shapes and dtypes
    data = {
        "hx": jnp.asarray(rng.standard_normal((npp, kp))),
        "hz": jnp.asarray(rng.standard_normal((npp, vmax // 2 + 1))),
        "p": jnp.asarray(rng.uniform(0.5, 4.0, npp)),
        "Pz": jnp.asarray(rng.standard_normal(npp)),
        "coef": jnp.asarray(rng.standard_normal(npp) * 1e-2),
        "seg": jnp.asarray(rng.integers(0, 64, npp), dtype=jnp.int32),
    }
    blocks = jnp.asarray(
        rng.permutation(npp).reshape(NB, T).astype(np.int32))

    # Boys-like table: exact values are irrelevant to the fault; keep the
    # op mix (exp + division ladder) of a downward Boys recursion.
    def boys_like(nmax, x):
        ex = jnp.exp(-x)
        F = [ex / (2.0 * nmax + 1.0)]
        for n in range(nmax - 1, -1, -1):
            F.append((2.0 * x * F[-1] + ex) / (2.0 * n + 1.0))
        return jnp.stack(F[::-1], axis=-1)   # (batch, nmax+1)

    def rz_table(PQz, alpha):
        """The scaled Rz recurrence (unrolled vmax times at trace time)."""
        F = boys_like(nmax, alpha * PQz * PQz)
        signs = jnp.array([(-1.0) ** n for n in range(nmax + 1)],
                          dtype=F.dtype)
        rows = [F * signs]
        inv_s = 0.5 / alpha
        for v in range(1, vmax + 1):
            prev1 = rows[v - 1]
            s1 = jnp.concatenate([prev1[:, 1:],
                                  jnp.zeros_like(prev1[:, :1])], axis=1)
            row = PQz[:, None] * s1
            if v > 1:
                prev2 = rows[v - 2]
                s2 = jnp.concatenate([prev2[:, 1:],
                                      jnp.zeros_like(prev2[:, :1])], axis=1)
                row = row + ((v - 1) * inv_s)[:, None] * s2
            rows.append(row)
        return jnp.stack(rows, axis=1)       # (batch, vmax+1, nmax+1)

    conv_K = np.zeros((kp, kp, 2 * kp - 1))
    for a in range(kp):
        for b in range(kp):
            conv_K[a, b, a + b] = 1.0
    conv_K = jnp.asarray(conv_K)

    def chunk_body(b):
        """One row-chunk x all columns -- the real sweep's op mix: gather,
        outer products, coupling einsums, the Rz recurrence at quartet
        width, a total einsum, and a segment-sum."""
        idx = jax.lax.dynamic_index_in_dim(blocks, b, keepdims=False)
        d = {k: v[idx] for k, v in data.items()}
        acc = jnp.zeros((64,))
        for cb in range(2):                  # two column blocks per chunk
            cols = {k: v[cb * T:(cb + 1) * T] for k, v in data.items()}
            alpha = (d["p"][:, None] * cols["p"][None, :]
                     / (d["p"][:, None] + cols["p"][None, :]))
            PQz = d["Pz"][:, None] - cols["Pz"][None, :]
            if args.no_einsum:
                Gx = d["hx"][:, None, :] * cols["hx"][None, :, :]
                axy = (Gx * Gx).sum(-1, keepdims=True) * jnp.ones(nmax + 1)
            else:
                Gx = jnp.einsum("rk,cl,klm->rcm", d["hx"], cols["hx"],
                                conv_K)
                axy = jnp.einsum("rcm,rcu->rc", Gx, Gx)[..., None] \
                    * jnp.ones(nmax + 1)
            if args.no_recur:
                Rz = (PQz.reshape(-1)[:, None, None]
                      ** jnp.arange(vmax + 1)[None, :, None]
                      * jnp.ones(nmax + 1))
            else:
                Rz = rz_table(PQz.reshape(-1), alpha.reshape(-1))
            total = jnp.einsum("qvn,qn->q", Rz,
                               axy.reshape(-1, nmax + 1))
            vals = (total.reshape(T, T)
                    * d["coef"][:, None] * cols["coef"][None, :])
            acc = acc + jax.ops.segment_sum(
                vals.sum(1), d["seg"], num_segments=64)
        return acc

    if args.mode == "dispatch":
        step = jax.jit(chunk_body)
        t0 = time.time()
        out = jnp.zeros((64,))
        for b in range(NB):
            out = out + step(jnp.asarray(b, dtype=jnp.int32))
            if b % 16 == 0:
                print(f"  chunk {b}/{NB} v0={float(out[0]):.6e} "
                      f"({time.time()-t0:.1f}s)", flush=True)
        print(f"dispatch mode OK: v0={float(out[0]):.6e} "
              f"({time.time()-t0:.1f}s)", flush=True)
    else:
        print("SCAN mode: compiling the scan-over-chunks program "
              "(faulting class on the axon TPU v5e)...", flush=True)

        @jax.jit
        def sweep():
            def body(carry, b):
                return carry + chunk_body(b), None
            out, _ = jax.lax.scan(body, jnp.zeros((64,)),
                                  jnp.arange(NB, dtype=jnp.int32))
            return out

        t0 = time.time()
        out = sweep()
        print(f"scan mode survived: v0={float(out[0]):.6e} "
              f"({time.time()-t0:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
