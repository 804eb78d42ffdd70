"""VV10 non-local dispersion energy (Vydrov-Van Voorhis 2010).

Parity with tuna_dft.py:901-1063.  The O(G^2) pair kernel runs on device as
a row-blocked lax.scan (bounding memory to chunk x G instead of G x G, the
TPU analogue of the reference's 192-point CPU blocking), over a
density-masked grid padded to a fixed bucket size so the compiled kernel is
reused across geometries (no per-geometry retrace).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..output import log, log_spacer, timer
from .grid import construct_density_on_grid

_BUCKET = 2048
_ROW_CHUNK = 512


@partial(jax.jit, static_argnames=("n_points",))
def _vv10_kernel(density, w, sigma, pts, b, C, n_points):
    """Blocked VV10 double integral over a fixed-size padded grid."""
    weighted_density = density * w
    s_over_n2 = sigma / (density * density)
    omega = jnp.sqrt(C * s_over_n2 * s_over_n2 + (4.0 / 3.0) * jnp.pi * density)
    kappa = 1.5 * jnp.pi * b * (density / (9.0 * jnp.pi)) ** (1.0 / 6.0)

    n_chunks = n_points // _ROW_CHUNK
    pts_rows = pts.reshape(n_chunks, _ROW_CHUNK, 3)
    omega_rows = omega.reshape(n_chunks, _ROW_CHUNK)
    kappa_rows = kappa.reshape(n_chunks, _ROW_CHUNK)

    def chunk(carry, row):
        pts_r, omega_r, kappa_r = row
        d2 = jnp.sum((pts_r[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        g_i = d2 * omega_r[:, None] + kappa_r[:, None]
        g_j = d2 * omega[None, :] + kappa[None, :]
        kernel = -1.5 / (g_i * g_j * (g_i + g_j))
        return carry, kernel @ weighted_density

    _, inner_rows = jax.lax.scan(chunk, 0.0, (pts_rows, omega_rows, kappa_rows))
    inner = inner_rows.reshape(n_points)

    beta = (1.0 / 32.0) * (3.0 / b**2) ** (3.0 / 4.0)
    return weighted_density @ (beta + 0.5 * inner)


@jax.jit
def _density_sigma_on_grid(P, bfs, bf_grads):
    """(density, sigma) on the grid for one total density matrix."""
    density = construct_density_on_grid(P, bfs).ravel()
    gradient = 2 * jnp.einsum("ij,ikl,ajkl->akl", P, bfs, bf_grads,
                              optimize=True)
    sigma = jnp.sum(gradient * gradient, axis=0).ravel()
    return density, sigma


def vv10_energies_batch(P_batch, bfs_b, grads_b, w_b, pts_b, functional,
                        grid_axes=(0, 0, 0, 0)):
    """Per-point VV10 energies for a BATCH of converged densities.

    Serves the sharded scan/stencil fast paths (parallel._solve_points:
    per-geometry grids stacked on the batch axis) and the finite-field
    batch (one shared grid, grid_axes=(None,)*4).  Two device calls total:
    one vmapped density/sigma evaluation, then -- after the host-side
    density masking that picks each point's active set -- one vmapped
    padded kernel over a COMMON bucket size (the max over the batch), so
    the compiled kernel is shared by every batch element.  The reference
    evaluates VV10 once per serial scan point (tuna_dft.py:901-1063).
    """
    b = functional.VV10_b if functional is not None else 3.9
    C = functional.VV10_C if functional is not None else 0.0093
    scaling = functional.VV10_scaling if functional is not None else 1.0

    n_b = len(P_batch)
    bfs_ax, grads_ax, w_ax, pts_ax = grid_axes
    dens_b, sigma_b = jax.vmap(_density_sigma_on_grid,
                               in_axes=(0, bfs_ax, grads_ax))(
        jnp.asarray(P_batch), jnp.asarray(bfs_b), jnp.asarray(grads_b))
    dens_b = np.asarray(dens_b)
    sigma_b = np.asarray(sigma_b)
    w_np = np.asarray(w_b)
    pts_np = np.asarray(pts_b)

    masks = [dens_b[i] > 1e-10 for i in range(n_b)]
    m_max = max(int(np.sum(mk)) for mk in masks)
    n_points = max(_ROW_CHUNK, -(-m_max // _BUCKET) * _BUCKET)

    def padded(i, values_full, fill):
        out = np.full(n_points, fill, dtype=np.float64)
        active = values_full[masks[i]]
        out[:active.shape[0]] = active
        return out

    density = np.stack([padded(i, dens_b[i], 1.0) for i in range(n_b)])
    w = np.stack([padded(i, (w_np[i] if w_ax == 0 else w_np).ravel(), 0.0)
                  for i in range(n_b)])
    sigma = np.stack([padded(i, sigma_b[i], 0.0) for i in range(n_b)])
    pts = np.zeros((n_b, n_points, 3))
    for i in range(n_b):
        src = (pts_np[i] if pts_ax == 0 else pts_np).reshape(3, -1).T
        act = src[masks[i]]
        pts[i, :act.shape[0]] = act

    kern = partial(_vv10_kernel, b=b, C=C, n_points=n_points)
    E = jax.jit(jax.vmap(lambda d, wt, sg, pt: kern(d, wt, sg, pt)))(
        jnp.asarray(density), jnp.asarray(w), jnp.asarray(sigma),
        jnp.asarray(pts))
    return np.asarray(E) * scaling


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
    m = int(np.sum(mask))
    # pad the active set to a fixed bucket so the kernel compiles once
    n_points = max(_ROW_CHUNK, -(-m // _BUCKET) * _BUCKET)

    def padded(values, fill):
        out = np.full(n_points, fill, dtype=np.float64)
        out[:m] = values[mask]
        return jnp.asarray(out)

    density = padded(density_full, 1.0)
    w = padded(np.asarray(weights).ravel(), 0.0)   # zero weight kills padding
    sigma = padded(sigma_full, 0.0)
    pts_np = np.zeros((n_points, 3))
    pts_np[:m] = np.asarray(points).reshape(3, -1).T[mask]
    pts = jnp.asarray(pts_np)

    E_VV10 = float(_vv10_kernel(density, w, sigma, pts, b, C, n_points))
    E_VV10 *= functional.VV10_scaling

    log("[Done]", calculation, 1, silent=silent)
    log(f"\n  Energy from VV10:                {E_VV10:16.10f}", calculation, 1, silent=silent)
    log_spacer(calculation, 1, silent=silent)
    timer("Non-local VV10 dispersion", 1)
    return E_VV10
