"""Sweep the production solve's f32 warm-phase depth on the live backend.

The warm thresholds are runtime scalars (post/cc.py production), so one
compiled executable covers the whole grid; wall times follow the
tunnel-safe recipe (perturb inputs, synchronise by fetching).

Usage: python tools/sweep_warm.py [basis]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "6-311G"
    config = f"SPE : N N 1.1 : CCSD {basis} : TIGHTSCF"

    from bench import _setup_ours
    from tuna_tpu.post.cc import (CCSettings, get_production_solver,
                                  ozaki_appropriate)

    cfg, SCF_output, g, F, d1, d2, t1_0, t2_0, o, v = _setup_ours(config)
    no, nv = o.stop - (o.start or 0), int(t2_0.shape[-1])
    settings = CCSettings(
        method="CCSD", restricted=True, update_singles=True,
        keep_disconnected=True, n_occ=no, n_virt=nv,
        max_iter=cfg.correlated_max_iter, use_diis=True,
        max_diis=cfg.max_DIIS_matrices, damping=0.0,
        use_ozaki=ozaki_appropriate(no, nv))
    production = get_production_solver(settings)
    dummy, d3 = jnp.zeros((1, 1)), jnp.zeros((1,))

    @jax.jit
    def packed(t2s, we, wa):
        out = production(g, F, d1, d2, t1_0, t2s, dummy, dummy, dummy, d3,
                         cfg.energy_convergence, cfg.amp_conv, we, wa)
        meta = jnp.stack([out[0].astype(jnp.float64),
                          out[3].astype(jnp.float64),
                          out[4].astype(jnp.float64),
                          out[6]])
        return meta

    grid = [(1e-6, 1e-4), (1e-7, 3e-5), (1e-8, 1e-5),
            (1e-8, 3e-6), (1e-8, 1e-6), (0.0, 0.0)]
    # compile once
    np.asarray(packed(t2_0, 1e-6, 1e-4))
    print(f"== {config} ==", flush=True)
    for we, wa in grid:
        walls = []
        for i in range(3):
            t2p = t2_0 * (1 + 1e-10 * (i + 1))
            np.asarray(t2p)
            t0 = time.perf_counter()
            meta = np.asarray(packed(t2p, we, wa))
            walls.append(time.perf_counter() - t0)
        nw, nn, conv, E = int(meta[0]), int(meta[1]), bool(meta[2]), meta[3]
        print(f"  warm=({we:g},{wa:g}): wall {min(walls)*1e3:7.1f} ms  "
              f"n_warm={nw:2d} n_newton={nn} conv={conv} E={E:.10f}",
              flush=True)


if __name__ == "__main__":
    main()
