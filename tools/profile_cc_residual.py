"""Measure the CCSD residual's per-application cost on the live backend.

Round-4 questions (VERDICT.md):
  1. ozaki crossover: the round-3 gating numbers were measured while the
     "TPU" pipeline was silently running on one CPU core; re-measure the
     sliced-vs-emulated f64 residual on the real chip at both the headline
     (6-311G, o=7 v=19) and FLOP-carrying (cc-pVTZ, o=7 v=53) sizes.
  2. slice budget: TARGET_BITS=42 is ~100x more accuracy than the amplitude
     equations need; how much do 36/30 bits save?
  3. tunnel accounting: how much of the production solve's wall is
     per-FETCH round trips (scalar device->host) vs the single dispatch?

Method per .claude/skills/verify/SKILL.md: residual applications are chained
with data dependence inside ONE jitted lax.fori_loop (the tunnel replays
byte-identical calls; block_until_ready is a no-op -- synchronise by
fetching a scalar), so per-application = (wall - one round trip) / n_reps.

Usage:  python tools/profile_cc_residual.py [6-311G|CC-PVTZ] ...
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _setup(basis):
    from bench import _setup_ours
    cfg, SCF_output, g, F, d1, d2, t1_0, t2_0, o, v = _setup_ours(
        f"SPE : N N 1.1 : CCSD {basis} : TIGHTSCF")
    return g, F, d1, d2, t1_0, t2_0, o, v


def _residual_loop(g, F, d1, d2, t1_0, t2_0, o, v, n_reps, mode,
                   target_bits=None):
    """One jitted fn: n_reps chained CCSD update applications; returns a
    scalar so ONE fetch synchronises the chain."""
    from tuna_tpu.post import cc
    from tuna_tpu.ops import ozaki

    no = o.stop - (o.start or 0)
    nv = int(t2_0.shape[-1])

    if mode == "f32":
        g, F, d1, d2, t1_0, t2_0 = (jnp.asarray(x, jnp.float32)
                                    for x in (g, F, d1, d2, t1_0, t2_0))

    def fn(t1_in, t2_in, eps):
        # NOTE: this whole function body (including the fori_loop trace of
        # `body`) runs at jit-TRACE time, so the _plan patch must live here.
        oo, vv = slice(0, no), slice(no, None)
        B = cc._restricted_blocks(g, oo, vv)
        old_plan = ozaki._plan
        if mode == "ozaki" and target_bits is not None:
            ozaki._plan = lambda K, tb=None: old_plan(K, target_bits)
        try:
            if mode == "ozaki":
                ks = {no, nv, no * no, no * nv, nv * nv, no * no * nv,
                      no * nv * nv}
                for X in list(B.values()) + [F]:
                    for K in sorted(ks):
                        plan = ozaki._plan(int(K))
                        if plan is not None:
                            ozaki._split_cached(X, plan[0], plan[1])

                def body(i, carry):
                    t1, t2 = carry
                    token = cc._EINSUM_IMPL.set(ozaki.einsum)
                    try:
                        t1n, t2n = cc._r_ccsd(B, F[oo, vv], d1, d2, t1, t2, {})
                    finally:
                        cc._EINSUM_IMPL.reset(token)
                    return (t1n * (1 + eps), t2n * (1 + eps))
            else:
                def body(i, carry):
                    t1, t2 = carry
                    t1n, t2n = cc._r_ccsd(B, F[oo, vv], d1, d2, t1, t2, {})
                    return (t1n * (1 + eps), t2n * (1 + eps))

            t1f, t2f = jax.lax.fori_loop(0, n_reps, body, (t1_in, t2_in))
        finally:
            ozaki._plan = old_plan
        return jnp.sum(t2f)

    return jax.jit(fn), t1_0, t2_0


def measure(basis, n_reps=10, modes=("f32", "f64", "ozaki42", "ozaki36",
                                     "ozaki30")):
    print(f"=== {basis} ===", flush=True)
    g, F, d1, d2, t1_0, t2_0, o, v = _setup(basis)
    results = {}
    for spec in modes:
        if spec.startswith("ozaki"):
            mode, tb = "ozaki", int(spec[5:])
        else:
            mode, tb = spec, None
        fn, t1a, t2a = _residual_loop(g, F, d1, d2, t1_0, t2_0, o, v,
                                      n_reps, mode, tb)
        eps = np.float64(1e-12).astype(t2a.dtype)
        s = float(fn(t1a, t2a, eps))           # compile + run
        walls = []
        for i in range(3):
            e = np.float64(1e-12 * (i + 2)).astype(t2a.dtype)
            t0 = time.perf_counter()
            s = float(fn(t1a, t2a, e))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        per = wall / n_reps
        results[spec] = per
        print(f"  {spec:9s}: {wall * 1e3:8.1f} ms / {n_reps} applications "
              f"= {per * 1e3:7.2f} ms/residual   (chain sum {s:.3e})",
              flush=True)
    return results


def fetch_accounting():
    """Cost of scalar fetches through the tunnel: one call returning two
    scalars, fetched (a) bundled in one array, (b) as two separate fetches."""
    print("=== tunnel fetch accounting ===", flush=True)
    x0 = jnp.arange(4096.0, dtype=jnp.float32)

    @jax.jit
    def two_scalars(x):
        y = jnp.sin(x).sum()
        z = jnp.cos(x).sum()
        return y, z, jnp.stack([y, z])

    y, z, packed = two_scalars(x0)  # compile
    float(y), float(z), np.asarray(packed)
    for label, action in (
            ("1 fetch (packed)", lambda out: np.asarray(out[2])),
            ("2 fetches", lambda out: (float(out[0]), float(out[1]))),
            ("call+1 fetch", None), ("call+2 fetches", None)):
        walls = []
        for i in range(5):
            xp = x0 + (i + 1) * 1e-3
            if label.startswith("call"):
                t0 = time.perf_counter()
                out = two_scalars(xp)
                if "1 fetch" in label:
                    np.asarray(out[2])
                else:
                    float(out[0]), float(out[1])
                walls.append(time.perf_counter() - t0)
            else:
                out = two_scalars(xp)
                np.asarray(out[2])  # force execution first
                t0 = time.perf_counter()
                action(out)
                walls.append(time.perf_counter() - t0)
        print(f"  {label:18s}: min {min(walls) * 1e3:6.1f} ms "
              f"median {sorted(walls)[2] * 1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    targets = sys.argv[1:] or ["fetch", "6-311G", "CC-PVTZ"]
    for t in targets:
        if t == "fetch":
            fetch_accounting()
        else:
            measure(t)
