"""Per-stage timing of the ERI quartet sweep's inner kernel on the chip.

Times the three candidate hot spots of `IntegralPlan._sweep_blocks`'s
block_values at the real cc-pVTZ block shape (T=346, lmax=3):

  * boys_table(nmax4, x) on the (T*T,) quartet batch
  * build_scaled_Rz_table(vmax4, nmax4, ...) (which itself calls boys)
  * the post-Boys coupling einsums (Gx/Gy/Gz/axy/total) with Rz given

Protocol per .claude/skills/verify/SKILL.md: chained applications inside
one jit (fori_loop with input perturbation so the tunnel cannot replay),
scalar fetch to synchronise, per-application time = slope over reps.

Run: timeout 1800 python tools/profile_sweep_stages.py [T] [lmax]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tuna_tpu.ops.boys import boys_table
from tuna_tpu.ops.integrals import build_scaled_Rz_table, _double_factorial

T = int(sys.argv[1]) if len(sys.argv) > 1 else 346
lmax = int(sys.argv[2]) if len(sys.argv) > 2 else 3
tmax = 2 * lmax
vmax4 = 2 * tmax
nmax4 = 4 * lmax
kp = lmax + 1
B = T * T

print(f"backend={jax.default_backend()} T={T} lmax={lmax} batch={B}",
      flush=True)

key = jax.random.PRNGKey(0)


def timed(name, fn, x, reps=8):
    f = jax.jit(lambda x: jax.lax.fori_loop(
        0, reps, lambda i, c: fn(c + 1e-12 * i), x))
    f1 = jax.jit(lambda x: jax.lax.fori_loop(
        0, 1, lambda i, c: fn(c + 1e-12 * i), x))
    # compile both
    float(jnp.sum(f(x)))
    float(jnp.sum(f1(x)))
    t0 = time.perf_counter()
    float(jnp.sum(f1(x + 1e-9)))
    t1 = time.perf_counter()
    float(jnp.sum(f(x + 2e-9)))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / (reps - 1)
    print(f"{name:34s} {per * 1e3:9.2f} ms/application", flush=True)
    return per


# ---- stage 1: Boys on the quartet batch --------------------------------
x = jax.random.uniform(key, (B,), jnp.float64, 0.0, 60.0)
timed("boys_table(nmax4)", lambda x: jnp.sum(boys_table(nmax4, x), axis=-1), x)

# ---- stage 2: full scaled Rz table (incl. Boys) -------------------------
alpha = jax.random.uniform(key, (B,), jnp.float64, 0.1, 2.0)


def rz(pqz):
    return jnp.sum(build_scaled_Rz_table(vmax4, nmax4, pqz, alpha), axis=(1, 2))


timed("build_scaled_Rz_table (w/ boys)", rz, x)

# ---- stage 3: the coupling einsums with Rz given ------------------------
n2k = 2 * (kp - 1)
n2t = 2 * tmax
conv_K = np.zeros((kp, kp, n2k + 1))
for k1 in range(kp):
    for k2 in range(kp):
        conv_K[k1, k2, k1 + k2] = 1.0
conv_K = jnp.asarray(conv_K)
conv_T = np.zeros((tmax + 1, tmax + 1, n2t + 1))
for t in range(tmax + 1):
    for u in range(tmax + 1):
        conv_T[t, u, t + u] = 1.0
conv_T = jnp.asarray(conv_T)
pair_E = jnp.asarray(np.random.rand(n2k + 1, n2k + 1, nmax4 + 1))

gx12 = jax.random.normal(key, (T, T, kp), jnp.float64)
gx34 = jax.random.normal(key, (T, T, kp), jnp.float64)
gz12 = jax.random.normal(key, (T, T, tmax + 1), jnp.float64)
gz34 = jax.random.normal(key, (T, T, tmax + 1), jnp.float64)
Rz = jax.random.normal(key, (T, T, vmax4 + 1, nmax4 + 1), jnp.float64)


def einsums(g):
    Gx = jnp.einsum("rck,rcl,klm->rcm", g, gx34, conv_K)
    Gy = jnp.einsum("rck,rcl,klm->rcm", g, gx34, conv_K)
    Gz = jnp.einsum("rct,rcu,tuT->rcT", gz12, gz34, conv_T)
    axy = jnp.einsum("rcm,rcu,mun->rcn", Gx, Gy, pair_E)
    tot = jnp.einsum("rcv,rcvn,rcn->rc", Gz, Rz, axy)
    return g + 1e-12 * tot[..., None]  # shape-preserving carry


timed("coupling einsums (Rz given)", einsums, gx12)

# ---- stage 4: the ratio-powers / g-assembly elementwise prelude ---------
p12 = jax.random.uniform(key, (T, 1), jnp.float64, 0.1, 2.0)
q34 = jax.random.uniform(key, (1, T), jnp.float64, 0.1, 2.0)
hx = jax.random.normal(key, (T, kp), jnp.float64)
hz = jax.random.normal(key, (T, tmax + 1), jnp.float64)


def prelude(p12):
    psum = p12 + q34
    ratio12 = q34 / psum
    ratio34 = p12 / psum
    sqrt_r12 = jnp.sqrt(ratio12)
    sqrt_r34 = jnp.sqrt(ratio34)
    outs = [jnp.ones_like(sqrt_r12)]
    for _ in range(tmax):
        outs.append(outs[-1] * sqrt_r12)
    r12_half = jnp.stack(outs, axis=-1)
    outs = [jnp.ones_like(sqrt_r34)]
    for _ in range(tmax):
        outs.append(outs[-1] * sqrt_r34)
    r34_half = jnp.stack(outs, axis=-1)
    r12_full = r12_half * r12_half
    r34_full = r34_half * r34_half
    g1 = hx[:, None, :] * r12_half[..., : 2 * kp : 2]
    g2 = hx[None, :, :] * r34_half[..., : 2 * kp : 2]
    g3 = hz[:, None, :] * r12_full
    g4 = hz[None, :, :] * r34_full
    pref = 1.0 / (p12 * q34 * jnp.sqrt(psum))
    tot = (jnp.sum(g1 * g2, axis=-1) + jnp.sum(g3 * g4, axis=-1)) * pref
    return p12 + 1e-12 * jnp.sum(tot, axis=1, keepdims=True)


timed("ratio/g prelude", prelude, p12)
print("done", flush=True)
