"""Per-component cost of the pure-f64 CC while_loop body on the live backend.

The recorded per-iteration f64 cost (BENCH r4: 12.47 ms at N2/6-311G) is
~7 ms above the fused+ozaki residual application (5.17 ms) -- this tool
attributes the difference to the body's non-update components so the
op-count levers are measured, not guessed (emulated-f64 ops cost ~40 us
each regardless of size; see PERF.md).

Each component runs n_reps times inside ONE jitted lax.fori_loop with a
data dependency between repetitions (the axon tunnel replays byte-identical
calls instantly, and per-call round trips are ~25 ms -- chaining inside one
call is the only trustworthy unit).  A no-op loop is measured and
subtracted.

Usage:  timeout 1200 python tools/profile_f64_body.py [basis]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import tuna_tpu  # noqa: F401  (sets matmul precision, x64, cache)
import jax
import jax.numpy as jnp

from tuna_tpu.post import cc as cc_mod
from tuna_tpu.post.cc import (_diis_coefficients, _push_ring,
                              _restricted_blocks, _restricted_energy)

BASIS = sys.argv[1] if len(sys.argv) > 1 else "6-311G"
N_REPS = 40


def _setup(basis):
    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms

    line = f"SPE : N N 1.1 : CCSD {basis} : TIGHTSCF"
    ct, ms, bs, syms, coords, params = parse_input(line)
    cfg = Config(ct, process_method(ms), time.time(), params, bs, syms,
                 suppress_output=True)
    SCF_output, molecule, _, _ = calculate_energy(
        cfg, syms, coords, silent=True, do_correlation=False)
    g, _, eps, o, v = transforms.begin_spatial_orbital_calculation(
        molecule, SCF_output.integrals.ERI_AO, SCF_output, cfg, silent=True)
    g = g.swapaxes(1, 2)
    eps = jnp.asarray(eps)
    F = jnp.diag(eps)
    d1 = transforms.singles_epsilons(eps, o, v)
    d2 = transforms.doubles_epsilons(eps, eps, o, o, v, v)
    t1_0, t2_0 = d1 * F[o, v], g[o, o, v, v] * d2
    return g, F, t1_0, t2_0, o, v


def timed_loop(name, make_fn, *args):
    """make_fn(*args) -> jitted f(scalar_seed) -> scalar; time one call."""
    fn = jax.jit(make_fn(*args))
    float(fn(jnp.asarray(1.0)))            # compile
    walls = []
    for i in range(3):
        seed = jnp.asarray(1.0 + 1e-9 * (i + 1))
        float(seed)                        # materialise before timing
        t0 = time.perf_counter()
        float(fn(seed))                    # one call + one fetch
        walls.append(time.perf_counter() - t0)
    return name, min(walls)


def main():
    print(f"backend={jax.default_backend()} basis={BASIS}", file=sys.stderr)
    g, F, t1, t2, o, v = _setup(BASIS)
    M = 6
    B = _restricted_blocks(g, o, v)
    F_ov = F[o, v]
    r = jnp.concatenate([t1.ravel(), t2.ravel()]) * 1e-5
    # The production body keeps the DIIS error ring in the working dtype
    # (an f32 ring doubled the iteration count) and the amplitudes in ONE
    # flat ring (post/cc.py body)
    err_buf = jnp.stack([r * (k + 1) for k in range(M)])
    amp_flat = jnp.concatenate([t1.ravel(), t2.ravel()])
    amp_buf = jnp.stack([amp_flat * (1 + 1e-6 * k) for k in range(M)])
    coeffs = jnp.full((M,), 1.0 / M, dtype=t2.dtype)

    def noop():
        def run(seed):
            def body(i, acc):
                return acc * (1.0 + 1e-12 * i)
            return jax.lax.fori_loop(0, N_REPS, body, seed)
        return run

    def energy():
        def run(seed):
            def body(i, carry):
                acc, t1c = carry
                E = _restricted_energy(B, F_ov, t1c, t2,
                                       keep_disconnected=True)[0]
                return acc + E, t1c * (1.0 + 1e-12 * E)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, t1))[0]
        return run

    def diis_solve():
        def run(seed):
            def body(i, carry):
                acc, buf = carry
                ok, c = _diis_coefficients(buf, jnp.asarray(M), M)
                s = jnp.sum(c)
                return acc + s, buf * (1.0 + 1e-12 * s)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, err_buf))[0]
        return run

    def diis_incremental():
        # The production body's path: one (M,N)@(N,) matvec + diagonal
        # Gram shift + bordered solve (post/cc.py body)
        from tuna_tpu.post.cc import _diis_coefficients_from_gram
        G0 = err_buf @ err_buf.T

        def run(seed):
            def body(i, carry):
                acc, G, rr = carry
                g_new = jnp.einsum("ml,l->m", err_buf, rr)
                G2 = jnp.roll(jnp.roll(G, -1, axis=0), -1, axis=1)
                G2 = G2.at[M - 1, :].set(g_new).at[:, M - 1].set(g_new)
                ok, c = _diis_coefficients_from_gram(G2, jnp.asarray(M), M)
                s = jnp.sum(c)
                return acc + s, G2, rr * (1.0 + 1e-12 * s)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, G0, r))[0]
        return run

    def ring_pushes():
        def run(seed):
            def body(i, carry):
                acc, ba, be = carry
                ba, _ = _push_ring(ba, amp_flat * acc, jnp.asarray(M), M)
                be, _ = _push_ring(be, r * acc, jnp.asarray(M), M)
                return acc + 1e-12 * ba[0, 0], ba, be
            return jax.lax.fori_loop(
                0, N_REPS, body, (seed, amp_buf, err_buf))[0]
        return run

    def extrapolate():
        def run(seed):
            def body(i, carry):
                acc, c = carry
                tx = jnp.einsum("m,ml->l", c, amp_buf)
                s = tx[0] + tx[-1]
                return acc + s, c * (1.0 + 1e-12 * s)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, coeffs))[0]
        return run

    def extrapolate_mixed():
        # production body: f64 base + f32 residual-sized spread
        def run(seed):
            def body(i, carry):
                acc, c = carry
                spread = (amp_buf - amp_flat[None, :]).astype(jnp.float32)
                d = jnp.einsum("m,ml->l", c.astype(jnp.float32), spread)
                tx = amp_flat + d.astype(amp_flat.dtype)
                s = tx[0] + tx[-1]
                return acc + s, c * (1.0 + 1e-12 * s)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, coeffs))[0]
        return run

    def norms():
        # production body: f64 subtraction, then f32 convert + f32 norms
        def run(seed):
            def body(i, carry):
                acc, rc = carry
                r32 = (rc * 1.0000001).astype(jnp.float32)
                n2 = jnp.linalg.norm(r32)
                ok = (n2 < 1e-8) & jnp.all(jnp.isfinite(rc))
                return acc + jnp.where(ok, 1.0, 2.0) * n2, rc * (1 + 1e-12 * n2)
            return jax.lax.fori_loop(0, N_REPS, body, (seed, r))[0]
        return run

    results = [timed_loop("noop", noop)]
    base = results[0][1]
    for name, make in [("energy", energy), ("diis_solve", diis_solve),
                       ("diis_incremental", diis_incremental),
                       ("ring_pushes", ring_pushes),
                       ("extrapolate", extrapolate),
                       ("extrapolate_mixed", extrapolate_mixed),
                       ("norms", norms)]:
        results.append(timed_loop(name, make))

    print(f"{'component':14s} {'total_ms':>9s} {'per_rep_ms':>11s}  (n_reps={N_REPS})")
    for name, wall in results:
        net = wall - (base if name != "noop" else 0.0)
        print(f"{name:14s} {wall*1e3:9.2f} {max(net, 0.0)/N_REPS*1e3:11.3f}")


if __name__ == "__main__":
    main()
