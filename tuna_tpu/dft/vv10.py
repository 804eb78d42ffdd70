"""VV10 non-local dispersion energy (Vydrov-Van Voorhis 2010).

Parity with tuna_dft.py:901-1063.  The O(G^2) pair kernel runs as one
vectorised contraction on device over the density-masked grid (the reference
blocks it in 192-point chunks for CPU cache reasons; on TPU a single batched
evaluation with a fixed masked size maps better onto the hardware).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..output import log, log_spacer, timer
from .grid import construct_density_on_grid


def calculate_VV10_energy(P, grid_container, calculation, silent):
    bfs, weights, bf_grads, points = grid_container
    functional = calculation.functional
    b = functional.VV10_b if functional is not None else 3.9
    C = functional.VV10_C if functional is not None else 0.0093

    timer("Non-local VV10 dispersion", 0)
    log_spacer(calculation, 1, silent=silent)
    log("             Non-local Dispersion Energy", calculation, 1, silent=silent)
    log_spacer(calculation, 1, silent=silent)
    log(f'  Using a "b" value of {b} and "c" value of {C}.', calculation, 3,
        silent=silent, end="\n\n")
    log("  Calculating VV10 dispersion energy...      ", calculation, 1,
        silent=silent, end="")

    density_full = np.asarray(construct_density_on_grid(P, bfs)).ravel()
    gradient = 2 * jnp.einsum("ij,ikl,ajkl->akl", jnp.asarray(P), bfs, bf_grads,
                              optimize=True)
    sigma_full = np.asarray(jnp.sum(gradient * gradient, axis=0)).ravel()

    mask = density_full > 1e-10
    density = density_full[mask]
    w = np.asarray(weights).ravel()[mask]
    sigma = sigma_full[mask]
    pts = np.asarray(points).reshape(3, -1).T[mask]

    density = jnp.asarray(density)
    w = jnp.asarray(w)
    sigma = jnp.asarray(sigma)
    pts = jnp.asarray(pts)

    weighted_density = density * w
    s_over_n2 = sigma / (density * density)
    omega = jnp.sqrt(C * s_over_n2 * s_over_n2 + (4 / 3) * jnp.pi * density)
    kappa = 1.5 * jnp.pi * b * (density / (9 * jnp.pi)) ** (1 / 6)

    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    g_i = d2 * omega[:, None] + kappa[:, None]
    g_j = d2 * omega[None, :] + kappa[None, :]
    kernel = -1.5 / (g_i * g_j * (g_i + g_j))
    inner_integral = kernel @ weighted_density

    beta = (1 / 32) * (3 / b**2) ** (3 / 4)
    E_VV10 = float(weighted_density @ (beta + 0.5 * inner_integral)) * functional.VV10_scaling

    log("[Done]", calculation, 1, silent=silent)
    log(f"\n  Energy from VV10:                {E_VV10:16.10f}", calculation, 1, silent=silent)
    log_spacer(calculation, 1, silent=silent)
    timer("Non-local VV10 dispersion", 1)
    return E_VV10
