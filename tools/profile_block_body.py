"""Ablation timing of the REAL quartet-sweep block body on the chip.

Builds the N2/cc-pVTZ IntegralPlan, extracts `_sweep_blocks`'s closures,
and times progressively-larger prefixes of the per-block-pair body at the
real shapes, ONE block pair per program (NO scan over block pairs -- that
is the program class that faults the TPU worker; see
tools/eri_fault_bisect.py stage 8).  Each variant folds `reps`
applications over perturbed pair data inside one jit (the tunnel replays
byte-identical calls); per-application time = two-point slope (reps vs 1)
to cancel fixed dispatch/fetch costs; min of 3 repeats.

Stage cost = difference between consecutive variants:
  prelude  : exponent combos, ratio powers, g-vector assembly
  couple   : + packed Gx/Gy/Gz coupling einsums
  axy      : + the x*y pairing einsum
  rzonly   : Rz table alone (gather-Boys + recursion)
  full     : the real block_values (everything + total einsum + prefactor)

Run: timeout 1800 python tools/profile_block_body.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tuna_tpu import constants as const
from tuna_tpu.config import Config
from tuna_tpu.methods import lookup_method
from tuna_tpu.ops.integrals import IntegralPlan, build_scaled_Rz_table, _double_factorial
from tuna_tpu.system import Molecule

cfg = Config("SPE", lookup_method("HF"), 0.0, [], "CC-PVTZ",
             ["N", "N"], suppress_output=True)
coords = np.array([[0.0, 0.0, 0.0],
                   [0.0, 0.0, const.angstrom_to_bohr(1.10)]])
mol = Molecule(["N", "N"], coords, cfg)
plan = IntegralPlan(mol.cartesian_basis_functions, mol.n_atoms)
NBP = plan.n_block_pairs
print(f"backend={jax.default_backend()} lmax={plan.lmax} "
      f"T={plan.eri_row_chunk} block_pairs={NBP}", flush=True)

coords0 = jnp.asarray(mol.coordinates)
lmax = plan.lmax
tmax = 2 * lmax
vmax4 = 2 * tmax
nmax4 = 4 * lmax
kp = lmax + 1

block_rows, block_values, dtype = plan._sweep_blocks(coords0)
# one representative class-diagonal block pair (off-diagonal in blocks)
pair = plan._qt_block_pairs[1]
rowd0 = {k: np.asarray(v) for k, v in block_rows(int(pair[0])).items()}
cold0 = {k: np.asarray(v) for k, v in block_rows(int(pair[1])).items()}
T = rowd0["p"].shape[0]
print(f"pair={tuple(pair)} T={T} cls={rowd0['cls']}", flush=True)

sign = jnp.array([(-1.0) ** t for t in range(tmax + 1)])
pack_even = jnp.asarray([min(2 * k, tmax) for k in range(kp)], dtype=jnp.int32)
pack_odd = jnp.asarray([min(2 * k + 1, tmax) for k in range(kp)], dtype=jnp.int32)
n2k = 2 * (kp - 1)
conv_K = np.zeros((kp, kp, n2k + 1))
for k1 in range(kp):
    for k2 in range(kp):
        conv_K[k1, k2, k1 + k2] = 1.0
conv_K = jnp.asarray(conv_K)
n2t = 2 * tmax
conv_T = np.zeros((tmax + 1, tmax + 1, n2t + 1))
for t in range(tmax + 1):
    for u in range(tmax + 1):
        conv_T[t, u, t + u] = 1.0
conv_T = jnp.asarray(conv_T)
dfact_x = np.array([_double_factorial(2 * m - 1) for m in range(n2k + 2)])
pair_E_cls = np.zeros((4, n2k + 1, n2k + 1, nmax4 + 1))
for cls_i in range(4):
    px_c, py_c = cls_i >> 1, cls_i & 1
    s_cls = (-1.0) ** (px_c + py_c)
    for m1 in range(n2k + 1):
        for m2 in range(n2k + 1):
            n = m1 + px_c + m2 + py_c
            if n <= nmax4:
                pair_E_cls[cls_i, m1, m2, n] = (
                    s_cls * dfact_x[m1 + px_c] * dfact_x[m2 + py_c])
pair_E_cls = jnp.asarray(pair_E_cls)


def body_prefix(rowd, cold, stop):
    p12 = rowd["p"][:, None]
    q34 = cold["p"][None, :]
    psum = p12 + q34
    alpha = p12 * q34 / psum
    PQz = rowd["Pz"][:, None] - cold["Pz"][None, :]

    if stop == "rzonly":
        Rz = build_scaled_Rz_table(vmax4, nmax4,
                                   PQz.reshape(-1), alpha.reshape(-1))
        return jnp.sum(Rz)

    ratio12 = q34 / psum
    ratio34 = p12 / psum
    sqrt_r12 = jnp.sqrt(ratio12)
    sqrt_r34 = jnp.sqrt(ratio34)

    def ratio_powers(base):
        outs = [jnp.ones_like(base)]
        for _ in range(tmax):
            outs.append(outs[-1] * base)
        return jnp.stack(outs, axis=-1)

    r12_half = ratio_powers(sqrt_r12)
    r34_half = ratio_powers(sqrt_r34)
    r12_full = r12_half * r12_half
    r34_full = r34_half * r34_half

    cls = rowd["cls"]
    px = cls >> 1
    py = cls & 1
    idxx = jnp.where(px == 1, pack_odd, pack_even)
    idxy = jnp.where(py == 1, pack_odd, pack_even)
    r12_k = r12_half[..., : 2 * kp : 2]
    r34_k = r34_half[..., : 2 * kp : 2]
    fx12 = jnp.where(px == 1, sqrt_r12, 1.0)[..., None]
    fy12 = jnp.where(py == 1, sqrt_r12, 1.0)[..., None]
    fx34 = jnp.where(px == 1, sqrt_r34, 1.0)[..., None]
    fy34 = jnp.where(py == 1, sqrt_r34, 1.0)[..., None]

    gx12 = rowd["hx"][:, idxx][:, None, :] * r12_k * fx12
    gy12 = rowd["hy"][:, idxy][:, None, :] * r12_k * fy12
    gx34 = cold["hx"][:, idxx][None, :, :] * r34_k * fx34
    gy34 = cold["hy"][:, idxy][None, :, :] * r34_k * fy34
    gz12 = rowd["hz"][:, None, :] * r12_full
    gz34 = (cold["hz"] * sign)[None, :, :] * r34_full

    if stop == "prelude":
        return (jnp.sum(gx12 * gx34) + jnp.sum(gy12 * gy34)
                + jnp.sum(gz12 * gz34))

    Gx = jnp.einsum("rck,rcl,klm->rcm", gx12, gx34, conv_K)
    Gy = jnp.einsum("rck,rcl,klm->rcm", gy12, gy34, conv_K)
    Gz = jnp.einsum("rct,rcu,tuT->rcT", gz12, gz34, conv_T)
    if stop == "couple":
        return jnp.sum(Gx) + jnp.sum(Gy) + jnp.sum(Gz)

    axy = jnp.einsum("rcm,rcu,mun->rcn", Gx, Gy, pair_E_cls[cls])
    if stop == "axy":
        return jnp.sum(axy) + jnp.sum(Gz)
    raise ValueError(stop)


def timed(name, fn_of_data, reps=8):
    """fn_of_data(rowd, cold) -> scalar; inputs perturbed per application."""
    rowd = {k: jnp.asarray(v) for k, v in rowd0.items()}
    cold = {k: jnp.asarray(v) for k, v in cold0.items()}

    def folded(rp, n):
        def body(i, acc):
            rd = dict(rowd)
            rd["p"] = rp + 1e-12 * i
            return acc + fn_of_data(rd, cold)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float64))

    f = jax.jit(lambda rp: folded(rp, reps))
    f1 = jax.jit(lambda rp: folded(rp, 1))
    rp0 = rowd["p"]
    float(f(rp0)); float(f1(rp0))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter(); float(f1(rp0 + 1e-9 * r))
        t1 = time.perf_counter(); float(f(rp0 + 2e-9 * r))
        t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
        best = min(best, per)
    print(f"{name:28s} {best * 1e3:9.2f} ms/block-pair "
          f"(x{NBP} = {best * NBP:6.2f} s/sweep)", flush=True)
    return best


if __name__ == "__main__":
    which = sys.argv[1:] or ["rzonly", "prelude", "couple", "axy", "full"]
    for v in which:
        if v == "full":
            timed("full block_values",
                  lambda rd, cd: jnp.sum(block_values(rd, cd)))
        else:
            timed(v, lambda rd, cd, v=v: body_prefix(rd, cd, v))
    print("done", flush=True)
