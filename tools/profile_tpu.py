"""Profile where CCSD iteration time goes on the TPU.

Everything is chained through data dependencies inside one jitted fori_loop,
because the axon tunnel serves repeated identical jitted calls instantly
(see .claude/skills/verify/SKILL.md).  Usage:

    python tools/profile_tpu.py matmul    # raw dtype throughput ladder
    python tools/profile_tpu.py ccsd      # residual vs solver overhead
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _timed(fn, *args, reps=3, perturb=None):
    """Time fn, feeding DIFFERENT arguments each rep: the axon tunnel serves
    byte-identical (executable, args) calls from a cache, so repeated calls
    must differ.  perturb(args, i) -> new args; default scales the first arg."""
    import jax
    import jax.numpy as jnp

    if perturb is None:
        def perturb(a, i):
            first = (a[0] * (1 + 1e-6 * (i + 1))).astype(a[0].dtype) \
                if jnp.issubdtype(a[0].dtype, jnp.floating) else a[0] + i + 1
            return (first,) + tuple(a[1:])

    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for i in range(reps):
        a = perturb(args, i)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best, out


def profile_matmul():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n, steps = 1024, 32
    flops = 2 * n**3 * steps

    def ladder(dtype, acc=None):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (n, n), dtype=jnp.float32) / np.sqrt(n)

        @jax.jit
        def chain(x):
            def body(_, x):
                y = jnp.dot(x, x, preferred_element_type=acc or dtype)
                return (y / (jnp.max(jnp.abs(y)) + 1e-30)).astype(dtype)
            return jax.lax.fori_loop(0, steps, body, x)

        x0 = A.astype(dtype)
        t, _ = _timed(chain, x0)
        print(f"  {str(dtype):>18} acc={str(acc):>14}: {t*1e3:8.2f} ms "
              f"-> {flops / t / 1e12:8.2f} Tflop/s")

    print(f"chained {steps}x {n}x{n} matmuls:")
    ladder(jnp.float64)
    ladder(jnp.float32)
    ladder(jnp.bfloat16, acc=jnp.float32)

    # int8 -> int32 (MXU integer path); rescale via shift to stay in range
    def int8_ladder():
        @jax.jit
        def chain(x):
            def body(_, x):
                y = jax.lax.dot_general(
                    x, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (y >> 12).astype(jnp.int8)
            return jax.lax.fori_loop(0, steps, body, x)
        x0 = jnp.asarray(np.random.randint(-8, 8, (n, n)), dtype=jnp.int8)
        t, _ = _timed(chain, x0)
        print(f"  {'int8':>18} acc={'int32':>14}: {t*1e3:8.2f} ms "
              f"-> {flops / t / 1e12:8.2f} Top/s")
    try:
        int8_ladder()
    except Exception as exc:
        print(f"  int8 matmul unavailable: {exc!r}")

    # f64 elementwise throughput (VPU emulation cost)
    import jax.numpy as jnp

    @jax.jit
    def ew_chain(x):
        def body(_, x):
            return x * 1.0000001 + 1e-9
        return jax.lax.fori_loop(0, 256, body, x)

    for dtype in (jnp.float64, jnp.float32):
        x = jnp.ones((n, n), dtype=dtype)
        t, _ = _timed(ew_chain, x)
        ops = 2 * n * n * 256
        print(f"  elementwise {str(dtype):>10}: {t*1e3:8.2f} ms "
              f"-> {ops / t / 1e9:8.1f} Gop/s")


def _setup_cc(basis):
    import time as _time
    import jax.numpy as jnp
    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms

    config = f"SPE : N N 1.1 : CCSD {basis} : TIGHTSCF"
    calc_type, method_string, _, symbols, coordinates, params = parse_input(config)
    cfg = Config(calc_type, process_method(method_string), _time.time(), params,
                 basis, symbols, suppress_output=True)
    SCF_output, molecule, _, _ = calculate_energy(cfg, symbols, coordinates,
                                                  silent=True, do_correlation=False)
    g, _, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
        molecule, SCF_output.integrals.ERI_AO, SCF_output, cfg, silent=True)
    g = g.swapaxes(1, 2)
    F = jnp.diag(jnp.asarray(epsilons))
    epsilons = jnp.asarray(epsilons)
    d1 = transforms.singles_epsilons(epsilons, o, v)
    d2 = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    t1_0, t2_0 = d1 * F[o, v], g[o, o, v, v] * d2
    return cfg, g, F, d1, d2, t1_0, t2_0, o, v


def profile_ccsd(basis="6-311G"):
    import jax
    import jax.numpy as jnp
    from tuna_tpu.post import cc

    cfg, g, F, d1, d2, t1_0, t2_0, o, v = _setup_cc(basis)
    no = o.stop - (o.start or 0)
    nv = int(t2_0.shape[-1])
    print(f"--- {basis}: o={no}, v={nv} ---")

    def residual_chain(dtype, steps_pair=(4, 20)):
        """Chained bare residual applications: no DIIS, no energy, no ring.
        Times two chain lengths and differences out the ~25 ms tunnel round
        trip; fetches a scalar (block_until_ready is a no-op through axon)."""
        gc = jnp.asarray(g, dtype=dtype)
        Fc = jnp.asarray(F, dtype=dtype)
        d1c, d2c = jnp.asarray(d1, dtype=dtype), jnp.asarray(d2, dtype=dtype)
        oo, vv = slice(0, no), slice(no, None)
        B = cc._restricted_blocks(gc, oo, vv)

        def make(steps):
            @jax.jit
            def chain(t1, t2):
                def body(_, carry):
                    t1, t2 = carry
                    return cc._r_ccsd(B, Fc[oo, vv], d1c, d2c, t1, t2, None)
                t1, t2 = jax.lax.fori_loop(0, steps, body, (t1, t2))
                return jnp.sum(t1) + jnp.sum(t2)
            return chain

        ts = []
        for steps in steps_pair:
            chain = make(steps)
            t1c = jnp.asarray(t1_0, dtype=dtype)
            t2c = jnp.asarray(t2_0, dtype=dtype)
            float(chain(t1c, t2c))  # compile
            times = []
            for i in range(3):
                t2p = t2c * (1 + 1e-6 * (i + 1))
                jax.block_until_ready(t2p)
                t0 = time.perf_counter()
                float(chain(t1c, t2p))
                times.append(time.perf_counter() - t0)
            ts.append(min(times))
        per = (ts[1] - ts[0]) / (steps_pair[1] - steps_pair[0])
        print(f"  bare residual {str(dtype):>10}: {per*1e3:8.2f} ms/application "
              f"(round trip {ts[0]*1e3:.1f} ms)")
        return per

    def solver_run(dtype, econv, aconv):
        """Full production solver (residual + energy + DIIS + ring buffers)."""
        settings = cc.CCSettings(
            method="CCSD", restricted=True, update_singles=True,
            keep_disconnected=True, n_occ=no, n_virt=nv,
            max_iter=cfg.correlated_max_iter, use_diis=True,
            max_diis=cfg.max_DIIS_matrices, damping=0.0)
        solver = cc.get_cc_solver(settings)
        cast = lambda x: jnp.asarray(x, dtype=dtype)
        dummy, d3 = cast(jnp.zeros((1, 1))), cast(jnp.zeros((1,)))
        args = (cast(g), cast(F), cast(d1), cast(d2), cast(t1_0), cast(t2_0),
                dummy, dummy, dummy, d3)
        out = solver(*args, econv, aconv)
        int(out[0])  # compile + sync (block_until_ready is a no-op on axon)
        best = float("inf")
        for i in range(3):
            # vary the starting amplitudes so the tunnel cannot replay the call
            a = args[:4] + (args[4] * (1 + 1e-9 * (i + 1)),
                            args[5] * (1 + 1e-9 * (i + 1))) + args[6:]
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            out = solver(*a, econv, aconv)
            n_iter = int(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"  full solver  {str(dtype):>10}: {best*1e3:8.1f} ms total, "
              f"{n_iter} iters -> {best/n_iter*1e3:8.2f} ms/iter "
              f"(E_corr={float(out[3]):.10f})")
        return best, n_iter

    residual_chain(jnp.float64)
    residual_chain(jnp.float32)
    solver_run(jnp.float64, 1e-9, 1e-7)
    solver_run(jnp.float32, 1e-6, 1e-4)


def profile_newton(basis="6-311G"):
    """Wall time of the production mixed-precision path: f32 DIIS solve +
    Newton--Krylov f64 finisher, vs the pure-f64 while_loop solve."""
    import jax
    import jax.numpy as jnp
    from tuna_tpu.post import cc

    cfg, g, F, d1, d2, t1_0, t2_0, o, v = _setup_cc(basis)
    no, nv = o.stop - (o.start or 0), int(t2_0.shape[-1])
    print(f"--- {basis}: o={no}, v={nv} ---")
    settings = cc.CCSettings(
        method="CCSD", restricted=True, update_singles=True,
        keep_disconnected=True, n_occ=no, n_virt=nv,
        max_iter=cfg.correlated_max_iter, use_diis=True,
        max_diis=cfg.max_DIIS_matrices, damping=0.0,
        use_ozaki=cc.ozaki_appropriate(no, nv))
    solver = cc.get_cc_solver(settings)
    production_solver = cc.get_production_solver(settings)
    dummy, d3 = jnp.zeros((1, 1)), jnp.zeros((1,))

    def production(t1s, t2s):
        out = production_solver(g, F, d1, d2, t1s, t2s, dummy, dummy, dummy,
                                d3, 1e-9, 1e-7)
        # (n_warm, warm_ok, warm_stats, n_newton, conv, failed, E, t1, t2,
        #  hist, parts)
        return int(out[0]), int(out[3]), (out[3], out[4], out[5], out[6])

    production(t1_0, t2_0)  # compile both
    best = float("inf")
    for i in range(3):
        t2p = t2_0 * (1 + 1e-9 * (i + 1))
        jax.block_until_ready(t2p)
        t0 = time.perf_counter()
        nw, nn, out = production(t1_0, t2p)
        best = min(best, time.perf_counter() - t0)
    print(f"  production (f32 DIIS + Newton): {best*1e3:8.1f} ms total "
          f"({nw} f32 iters + {nn} Newton steps), conv={bool(out[1])}, "
          f"E_corr={float(out[3]):.12f}")

    # pure-f64 comparison
    out = solver(g, F, d1, d2, t1_0, t2_0, dummy, dummy, dummy, d3, 1e-9, 1e-7)
    int(out[0])
    best64 = float("inf")
    for i in range(3):
        t2p = t2_0 * (1 + 1e-9 * (i + 1))
        jax.block_until_ready(t2p)
        t0 = time.perf_counter()
        out = solver(g, F, d1, d2, t1_0, t2p, dummy, dummy, dummy, d3, 1e-9, 1e-7)
        n64 = int(out[0])
        best64 = min(best64, time.perf_counter() - t0)
    print(f"  pure f64 while_loop:            {best64*1e3:8.1f} ms total "
          f"({n64} iters), E_corr={float(out[3]):.12f}")
    print(f"  mixed-precision advantage: {best64/best:.1f}x")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    if mode == "matmul":
        profile_matmul()
    elif mode == "ccsd":
        profile_ccsd(sys.argv[2] if len(sys.argv) > 2 else "6-311G")
    elif mode == "newton":
        profile_newton(sys.argv[2] if len(sys.argv) > 2 else "6-311G")
    else:
        raise SystemExit(f"unknown mode {mode}")
