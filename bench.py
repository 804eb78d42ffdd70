"""Headline benchmark: CCSD time-to-converged-energy on N2/6-311G.

Compares this framework (on whatever accelerator JAX finds -- the TPU when
run unmodified on this box) against the CPU reference implementation
(/root/reference/TUNA, run in-process via tools.reference_oracle), per
BASELINE.md: north-star is >= 20x speedup at <= 1e-8 Ha energy agreement.

Accounting (honest, like-for-like):
  * wall_ours_ms      -- the production mixed-precision solve, MP2 guess to
                         converged f64 fixed point (f32 DIIS warm iterations
                         + Newton-Krylov f64 refinement), best of 3
  * wall_ref_ms       -- sum of the reference's timed CCSD iterations
  * per_iter_f64_*    -- pure-f64 per-iteration on both sides (ours: the f64
                         while_loop solver; no f32 iterations in the count).
                         Ours is a two-point difference: the SAME executable
                         run to convergence (n iters) and with zero
                         convergence thresholds (max_iter iters); the slope
                         (wall_long - wall_short) / (n_long - n_short) is the
                         marginal iteration cost, with the fixed per-call
                         tunnel round trip, the fetch, and the post-loop
                         energy evaluations cancelled -- like-for-like with
                         the reference's per-iteration median, which also
                         excludes its setup/teardown.
  * value (headline)  -- wall_ref / wall_ours: time-to-converged speedup

Prints exactly ONE JSON line on stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

CONFIG = "SPE : N N 1.1 : CCSD 6-311G : TIGHTSCF"


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def filter_spurious_aot_stderr():
    """Drop XLA's cpu_aot_loader feature-mismatch error lines from stderr.

    When a persisted XLA:CPU executable (the lmax>=3 host-fallback ERIs) is
    reloaded ON THE SAME HOST, XLA's strict feature check still fails: the
    compile-time feature list records XLA's own pseudo-features
    (+prefer-no-scatter/+prefer-no-gather), which never appear in the
    /proc/cpuinfo-derived host list, so every load logs two multi-KB
    "could lead to execution errors such as SIGILL" error blocks that are
    pure false positives (same host, verified by the per-host cache
    namespace in tuna_tpu/__init__.py).  The C++ logger writes straight to
    fd 2, so the filter interposes at the fd level.  Everything else passes
    through unchanged."""
    import threading

    real_fd = os.dup(2)
    read_fd, write_fd = os.pipe()
    os.dup2(write_fd, 2)
    os.close(write_fd)

    def pump():
        with os.fdopen(read_fd, "rb") as src, os.fdopen(real_fd, "wb") as dst:
            for line in src:
                if (b"cpu_aot_loader" in line
                        or b"Machine type used for XLA:CPU" in line):
                    continue
                dst.write(line)
                dst.flush()

    threading.Thread(target=pump, daemon=True).start()


def ensure_live_backend(timeout=600):
    """Probe the configured JAX backend in a subprocess; if it hangs or fails
    (the remote-TPU tunnel can wedge for hours after a worker crash), re-exec
    on the CPU backend so the benchmark always completes and reports
    honestly (see the "backend" field in the JSON)."""
    if os.environ.get("BENCH_BACKEND_CHECKED"):
        return
    probe = ("import jax, jax.numpy as jnp;"
             "jax.config.update('jax_enable_x64', True);"
             "print(float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))))")
    try:
        result = subprocess.run([sys.executable, "-c", probe],
                                capture_output=True, text=True, timeout=timeout)
        ok = result.returncode == 0 and "512" in result.stdout
    except subprocess.TimeoutExpired:
        ok = False
    if ok:
        os.environ["BENCH_BACKEND_CHECKED"] = "1"
        return
    note("configured backend unreachable (tunnel wedged?); "
         "falling back to CPU")
    env = dict(os.environ)
    for key in list(env):
        if key.startswith("PALLAS_AXON") or key.startswith("AXON"):
            del env[key]
    pythonpath = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_BACKEND_CHECKED"] = "1"
    env["BENCH_TPU_UNREACHABLE"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def tpu_outage_fields(backend):
    """When the TPU tunnel is down at bench time, attach the most recent
    TPU-recorded artifact (committed mid-round) as INFORMATIONAL fields --
    the scored `value` stays the honest live measurement on `backend`."""
    if backend != "cpu" or not os.environ.get("BENCH_TPU_UNREACHABLE"):
        return {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_r04_midround_tpu.json")
    try:
        with open(path) as fh:
            tpu = json.load(fh)
    except OSError:
        return {"tpu_outage": True}
    return {"tpu_outage": True,
            "note": ("TPU tunnel unreachable at bench time; this run "
                     "measured on CPU.  tpu_midround_* fields quote the "
                     "TPU artifact recorded earlier in the round "
                     "(BENCH_r04_midround_tpu.json)."),
            "tpu_midround_value": tpu.get("value"),
            "tpu_midround_wall_ours_ms": tpu.get("wall_ours_ms"),
            "tpu_midround_wall_speedup_ccpvtz": tpu.get("wall_speedup_ccpvtz"),
            "tpu_midround_energy_delta_ha": tpu.get("energy_delta_ha")}


# ---------------------------------------------------------------------------
# Ours
# ---------------------------------------------------------------------------

def _setup_ours(config):
    import jax.numpy as jnp
    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms

    calc_type, method_string, basis, symbols, coordinates, params = parse_input(config)
    cfg = Config(calc_type, process_method(method_string), time.time(), params,
                 basis, symbols, suppress_output=True)
    t0 = time.perf_counter()
    SCF_output, molecule, _, _ = calculate_energy(cfg, symbols, coordinates,
                                                  silent=True, do_correlation=False)
    note(f"SCF pipeline (incl. any compile): {time.perf_counter() - t0:.2f}s")

    g, _, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
        molecule, SCF_output.integrals.ERI_AO, SCF_output, cfg, silent=True)
    g = g.swapaxes(1, 2)
    epsilons = jnp.asarray(epsilons)
    F = jnp.diag(epsilons)
    d1 = transforms.singles_epsilons(epsilons, o, v)
    d2 = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    t1_0, t2_0 = d1 * F[o, v], g[o, o, v, v] * d2
    return cfg, SCF_output, g, F, d1, d2, t1_0, t2_0, o, v


def measure_ours(config=CONFIG, label="headline"):
    import jax
    import jax.numpy as jnp
    from tuna_tpu.post.cc import (CCSettings, get_cc_solver,
                                  get_production_solver, ozaki_appropriate)

    note(f"devices: {jax.devices()}")
    cfg, SCF_output, g, F, d1, d2, t1_0, t2_0, o, v = _setup_ours(config)

    settings = CCSettings(
        method="CCSD", restricted=True, update_singles=True,
        keep_disconnected=True, n_occ=o.stop - (o.start or 0),
        n_virt=int(t2_0.shape[-1]), max_iter=cfg.correlated_max_iter,
        use_diis=True, max_diis=cfg.max_DIIS_matrices, damping=0.0,
        use_ozaki=ozaki_appropriate(
            o.stop - (o.start or 0), int(t2_0.shape[-1])))
    solver = get_cc_solver(settings)
    # The SHIPPED solve differs by backend (post/cc.py production gate): the
    # f32-warm + Newton-Krylov path exists to dodge emulated-f64 per-op cost
    # on accelerators; on the CPU backend native f64 is fast and the shipped
    # path is the plain f64 while_loop -- time what a user actually gets.
    on_cpu = jax.default_backend() == "cpu"
    production_solver = None if on_cpu else get_production_solver(settings)
    dummy, d3 = jnp.zeros((1, 1)), jnp.zeros((1,))

    # Every scalar device->host fetch through the axon tunnel costs its own
    # ~22 ms round trip (measured, tools/profile_cc_residual.py: call+1
    # fetch 23.6 ms, call+2 fetches 44.3 ms), so the solve's counters are
    # packed into ONE fetched array -- one synchronising round trip, which
    # is what a real client of the solve would pay.
    if on_cpu:
        def production(t2s):
            """The shipped CPU solve: the pure-f64 while_loop."""
            out = solver(g, F, d1, d2, t1_0, t2s, dummy, dummy, dummy, d3,
                         cfg.energy_convergence, cfg.amp_conv)
            n_iter = int(out[0])
            conv = bool(out[1]) and not bool(out[2])
            # match the production tuple layout consumed below:
            # (.., E_corr at index 6 -> out[3] here is E)
            return 0, n_iter, conv, (None, None, None, None, None, None,
                                     out[3])
    else:
        @jax.jit
        def _production_packed(t2s):
            out = production_solver(g, F, d1, d2, t1_0, t2s, dummy, dummy,
                                    dummy, d3, cfg.energy_convergence,
                                    cfg.amp_conv)
            meta = jnp.stack([out[0].astype(jnp.float64),
                              out[3].astype(jnp.float64),
                              out[4].astype(jnp.float64)])
            return meta, out

        def production(t2s):
            """The shipped solve, ONE device call + ONE synchronising fetch."""
            meta, out = _production_packed(t2s)
            meta = np.asarray(meta)
            return int(meta[0]), int(meta[1]), bool(meta[2]), out

    nw, nn, conv, out = production(t2_0)  # compile + converge once
    if not conv:
        raise RuntimeError("production CCSD solve did not converge")
    E_corr = float(out[6])
    note(f"{label}: production solve converged, {nw} f32 warm iters + "
         f"{nn} Newton steps, E_corr = {E_corr:.10f}")

    # Wall-to-converged, best of 3 (inputs perturbed so the axon tunnel
    # cannot replay byte-identical calls)
    walls = []
    for i in range(3):
        t2p = t2_0 * (1 + 1e-10 * (i + 1))
        np.asarray(t2p)  # materialise BEFORE timing (block_until_ready is a
        #                  no-op through the tunnel; fetching synchronises)
        t0 = time.perf_counter()
        nw, nn, conv, out = production(t2p)
        walls.append(time.perf_counter() - t0)
    wall_ours = min(walls)
    note(f"{label}: wall-to-converged (ours): {wall_ours * 1e3:.1f} ms "
         f"({nw} f32 iters + {nn} Newton steps)")

    # Pure-f64 per-iteration (like-for-like with the reference's iterations):
    # two-point slope over the SAME executable -- convergence thresholds are
    # runtime scalars, so zero thresholds force the full max_iter sweep
    # without recompiling.  The slope cancels the fixed per-call costs
    # (dispatch round trip, synchronising fetch, post-loop energy
    # evaluations), which the reference's per-iteration median does not pay
    # either.
    out64 = solver(g, F, d1, d2, t1_0, t2_0, dummy, dummy, dummy, d3,
                   cfg.energy_convergence, cfg.amp_conv)
    int(out64[0])
    zero = float(0.0)
    out_full = solver(g, F, d1, d2, t1_0, t2_0, dummy, dummy, dummy, d3,
                      zero, zero)
    int(out_full[0])
    per_iter_samples, n_short, n_long, w_short, w_long = [], 0, 0, 0.0, 0.0
    for i in range(2):
        t2p = t2_0 * (1 + 1e-10 * (i + 1))
        np.asarray(t2p)
        t0 = time.perf_counter()
        out64 = solver(g, F, d1, d2, t1_0, t2p, dummy, dummy, dummy, d3,
                       cfg.energy_convergence, cfg.amp_conv)
        n_short = int(out64[0])
        w_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_full = solver(g, F, d1, d2, t1_0, t2p, dummy, dummy, dummy, d3,
                          zero, zero)
        n_long = int(out_full[0])
        w_long = time.perf_counter() - t0
        if n_long > n_short:
            per_iter_samples.append((w_long - w_short) / (n_long - n_short))
    per_iter_f64 = min(per_iter_samples)
    n64 = n_short
    note(f"{label}: pure-f64 solver: {w_short * 1e3:.1f} ms / {n_short} iters"
         f" to converged; slope ({w_long * 1e3:.1f} ms @ {n_long}) "
         f"= {per_iter_f64 * 1e3:.2f} ms/iter")

    E_total = float(SCF_output.energy) + E_corr
    return {"wall_ours": wall_ours, "per_iter_f64_ours": per_iter_f64,
            "n_warm_f32": nw, "n_newton": nn, "n_iter_f64": n64,
            "E_total": E_total,
            "solver": ("f64_while_loop" if on_cpu
                       else "f32_warm+newton_krylov")}


# ---------------------------------------------------------------------------
# Reference (CPU, in-process)
# ---------------------------------------------------------------------------

def measure_reference(config=CONFIG, label="headline", runs=2):
    sys.path.insert(0, ".")
    from tools.reference_oracle import load_reference, reference_calculation

    load_reference()
    import tuna_cc
    import tuna_energy

    best_wall, per_iter, E_ref, n_iter = None, None, None, 0
    original = tuna_cc.run_restricted_CCSD_iteration
    for run in range(runs):
        iteration_times = []

        def timed(*args, **kwargs):
            t0 = time.perf_counter()
            result = original(*args, **kwargs)
            iteration_times.append(time.perf_counter() - t0)
            return result

        tuna_cc.run_restricted_CCSD_iteration = timed
        try:
            calculation, symbols, coordinates = reference_calculation(config)
            result = tuna_energy.evaluate_molecular_energy(
                calculation, symbols, coordinates, terse=True, silent=True)
            E_ref = float(result[2])
        finally:
            tuna_cc.run_restricted_CCSD_iteration = original

        wall = sum(iteration_times)
        if best_wall is None or wall < best_wall:
            best_wall = wall
            per_iter = statistics.median(iteration_times)
            n_iter = len(iteration_times)

    note(f"{label}: reference CCSD: {n_iter} iterations, median "
         f"{per_iter * 1e3:.2f} ms/iter, wall {best_wall * 1e3:.1f} ms, "
         f"E = {E_ref:.10f}")
    return {"wall_ref": best_wall, "per_iter_ref": per_iter,
            "n_iter_ref": n_iter, "E_ref": E_ref}


def measure_secondary(basis="CC-PVTZ"):
    """Large-basis CCSD comparison: the FLOP-carrying regime the TPU is
    built for -- the 6-311G headline is latency-bound at o=7,v=19 (and
    carries this environment's ~25 ms per-call tunnel round trip)."""
    import os
    if os.environ.get("BENCH_SECONDARY", "1") == "0":
        return None
    config = f"SPE : N N 1.1 : CCSD {basis} : TIGHTSCF"
    note(f"--- secondary metric: {config} ---")
    ours = measure_ours(config, label=basis)
    ref = measure_reference(config, label=basis, runs=1)
    note(f"{basis}: wall speedup {ref['wall_ref'] / ours['wall_ours']:.1f}x, "
         f"pure-f64 per-iteration speedup "
         f"{ref['per_iter_ref'] / ours['per_iter_f64_ours']:.1f}x, "
         f"energy delta {abs(ours['E_total'] - ref['E_ref']):.2e} Ha")
    return {"wall_speedup_ccpvtz": ref["wall_ref"] / ours["wall_ours"],
            "per_iter_f64_speedup_ccpvtz": ref["per_iter_ref"] / ours["per_iter_f64_ours"],
            "wall_ours_ms_ccpvtz": ours["wall_ours"] * 1e3,
            "wall_ref_ms_ccpvtz": ref["wall_ref"] * 1e3,
            "energy_delta_ha_ccpvtz": abs(ours["E_total"] - ref["E_ref"])}


def main():
    ensure_live_backend()
    filter_spurious_aot_stderr()
    # The stdout contract is exactly ONE JSON line.  The reference prints its
    # ASCII banner to stdout on import (reference tuna.py:35), and future code
    # may stray, so ALL measurement work runs with stdout redirected to stderr
    # and the JSON line is written to the real stdout last.
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        import jax
        backend = jax.default_backend()
        ours = measure_ours()
        ref = measure_reference()

        delta = abs(ours["E_total"] - ref["E_ref"])
        note(f"energy delta vs reference: {delta:.2e} Ha "
             f"({'OK' if delta < 1e-8 else 'OUT OF CONTRACT'})")

        speedup_wall = ref["wall_ref"] / ours["wall_ours"]
        speedup_iter = ref["per_iter_ref"] / ours["per_iter_f64_ours"]

        secondary = None
        try:
            secondary = measure_secondary()
        except Exception as exc:  # secondary must never break the contract
            note(f"secondary metric skipped: {exc!r}")
    finally:
        sys.stdout = real_stdout

    print(json.dumps({
        "metric": "ccsd_wall_to_converged_speedup_vs_cpu_reference",
        "value": round(speedup_wall, 3),
        "unit": "x",
        "vs_baseline": round(speedup_wall / 20.0, 3),
        "wall_ours_ms": round(ours["wall_ours"] * 1e3, 2),
        "wall_ref_ms": round(ref["wall_ref"] * 1e3, 2),
        "per_iter_f64_ours_ms": round(ours["per_iter_f64_ours"] * 1e3, 3),
        "per_iter_ref_ms": round(ref["per_iter_ref"] * 1e3, 3),
        "speedup_per_iter_f64": round(speedup_iter, 3),
        "solver": ours["solver"],
        "n_warm_f32": ours["n_warm_f32"],
        "n_newton": ours["n_newton"],
        "n_iter_f64_ours": ours["n_iter_f64"],
        "n_iter_ref": ref["n_iter_ref"],
        "energy_delta_ha": float(f"{delta:.3e}"),
        "backend": backend,
        # Why the headline saturates: at o=7,v=19 the whole CCSD solve is a
        # few ms of math, but every device call through this environment's
        # axon tunnel pays a ~25 ms round trip (measured,
        # tools/profile_cc_residual.py) -- a hard floor that caps ANY
        # implementation at ~wall_ref/25ms (~4.6x here).  The FLOP-carrying
        # regime the TPU is built for is the cc-pVTZ secondary metric
        # (wall_speedup_ccpvtz), where per-call latency amortises.
        "headline_latency_floor_ms": 25.0,
        **({k: float(f"{val:.4g}") for k, val in secondary.items()}
           if secondary else {}),
        **tpu_outage_fields(backend),
    }), flush=True)


if __name__ == "__main__":
    main()
