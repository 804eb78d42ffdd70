"""Density functional theory: quadrature grids, exchange-correlation
functionals (autodiff derivatives), VV10 non-local dispersion and TD-DFT
kernels."""

from __future__ import annotations

import jax.numpy as jnp

from ..output import error
from . import xc


def make_xc_fn(calculation):
    """Validated, grid-free XC evaluator for a calculation's functional.

    Returns (xc_fn, needs_gradient) where
    xc_fn(P_alpha, P_beta, HFX, DFX, DFC, bfs, w, grads) ->
    (V_XC_alpha, V_XC_beta, E_x_grid, E_c_grid, density, alpha_density,
    beta_density).  The grid tensors are ARGUMENTS rather than closed-over
    constants so batched paths (tuna_tpu.parallel) can vmap one traced
    evaluator over stacked per-geometry grids; the serial SCF path binds
    them via make_xc_closure below.
    """
    functional = calculation.functional
    functional_class = functional.functional_class
    restricted = calculation.reference == "RHF"

    x_fn = xc.EXCHANGE_FUNCTIONALS.get(functional.x_name)
    c_fn = (xc.CORRELATION_FUNCTIONALS.get(functional.c_name) if restricted
            else xc.UNRESTRICTED_CORRELATION_FUNCTIONALS.get(functional.c_name))
    if functional.x_name is not None and x_fn is None:
        error(f"The {functional.x_name} exchange functional is not yet available in TUNA-TPU!")
    if functional.c_name is not None and c_fn is None:
        error(f"The {functional.c_name} correlation functional is not yet available in TUNA-TPU!")

    x_alpha_param = calculation.X_alpha
    method_name = calculation.method.name

    needs_gradient = functional_class in ("GGA", "meta-GGA")
    needs_tau = functional_class == "meta-GGA"

    def density_quantities(P, bfs, grads):
        density = xc.clean(jnp.einsum("ij,ikl,jkl->kl", P, bfs, bfs, optimize=True))
        sigma = tau = gradient = None
        if needs_gradient:
            gradient = 2 * jnp.einsum("ij,ikl,ajkl->akl", P, bfs, grads, optimize=True)
            sigma = xc.clean(jnp.sum(gradient * gradient, axis=0), floor=xc.SIGMA_FLOOR)
            if needs_tau:
                tau = xc.clean(0.5 * jnp.einsum("ij,aikl,ajkl->kl", P, grads, grads, optimize=True))
        return density, sigma, tau, gradient

    def V_matrix(df_dn, df_ds, df_dt, gradient, bfs, w, grads,
                 gradient_other=None, df_ds_ab=None):
        V = jnp.einsum("kl,mkl,nkl,kl->mn", df_dn, bfs, bfs, w, optimize=True)
        if df_ds is not None:
            V += 4 * jnp.einsum("kl,akl,mkl,ankl,kl->mn", df_ds, gradient, bfs, grads, w, optimize=True)
            if df_ds_ab is not None:
                V += 2 * jnp.einsum("kl,akl,mkl,ankl,kl->mn", df_ds_ab, gradient_other, bfs, grads, w, optimize=True)
        if df_dt is not None:
            V += 0.5 * jnp.einsum("kl,amkl,ankl,kl->mn", df_dt, grads, grads, w, optimize=True)
        return 0.5 * (V + V.T)

    params = xc.XCParams(x_alpha=x_alpha_param, method_name=method_name,
                         x_name=functional.x_name)

    if restricted:
        def xc_fn(P_a, P_b, HFX_prop, DFX_prop, DFC_prop, bfs, w, grads):
            P = P_a + P_b
            density, sigma, tau, gradient = density_quantities(P, bfs, grads)
            E_x = E_c = jnp.asarray(0.0, dtype=P.dtype)
            zeros = jnp.zeros_like(P)

            V_X = V_C = zeros
            if x_fn is not None:
                df_dn, df_ds, df_dt, e_X = xc.restricted_derivatives(x_fn, density, sigma, tau, params)
                V_X = V_matrix(df_dn, df_ds, df_dt, gradient, bfs, w, grads)
                E_x = jnp.sum(e_X * density * w) * DFX_prop
            if c_fn is not None:
                df_dn, df_ds, df_dt, e_C = xc.restricted_derivatives(c_fn, density, sigma, tau, params)
                V_C = V_matrix(df_dn, df_ds, df_dt, gradient, bfs, w, grads)
                E_c = jnp.sum(e_C * density * w) * DFC_prop

            V_XC = V_X * DFX_prop + V_C * DFC_prop
            return (V_XC, V_XC, E_x, E_c, density.ravel(),
                    (density / 2).ravel(), (density / 2).ravel())
    else:
        def xc_fn(P_a, P_b, HFX_prop, DFX_prop, DFC_prop, bfs, w, grads):
            dens_a, sigma_aa, tau_a, grad_a = density_quantities(P_a, bfs, grads)
            dens_b, sigma_bb, tau_b, grad_b = density_quantities(P_b, bfs, grads)
            density = dens_a + dens_b
            sigma_ab = (jnp.sum(grad_a * grad_b, axis=0) if needs_gradient else None)
            E_x = E_c = jnp.asarray(0.0, dtype=P_a.dtype)
            zeros = jnp.zeros_like(P_a)

            V_X_a = V_X_b = V_C_a = V_C_b = zeros
            if x_fn is not None:
                # Exact spin scaling: E_x[na, nb] = (Ex[2na] + Ex[2nb]) / 2
                sa = 4 * sigma_aa if sigma_aa is not None else None
                sb = 4 * sigma_bb if sigma_bb is not None else None
                ta = 2 * tau_a if tau_a is not None else None
                tb = 2 * tau_b if tau_b is not None else None
                dfn_a, dfs_a, dft_a, e_X_a = xc.restricted_derivatives(x_fn, 2 * dens_a, sa, ta, params)
                dfn_b, dfs_b, dft_b, e_X_b = xc.restricted_derivatives(x_fn, 2 * dens_b, sb, tb, params)
                dfs_a2 = 2 * dfs_a if dfs_a is not None else None
                dfs_b2 = 2 * dfs_b if dfs_b is not None else None
                V_X_a = V_matrix(dfn_a, dfs_a2, dft_a, grad_a, bfs, w, grads)
                V_X_b = V_matrix(dfn_b, dfs_b2, dft_b, grad_b, bfs, w, grads)
                E_x = (jnp.sum(e_X_a * dens_a * w) + jnp.sum(e_X_b * dens_b * w)) * DFX_prop
            if c_fn is not None:
                (dfn_a, dfn_b, dfs_aa, dfs_bb, dfs_ab, dft_a, dft_b, e_C) = \
                    xc.unrestricted_derivatives(c_fn, dens_a, dens_b, sigma_aa,
                                                sigma_bb, sigma_ab, tau_a, tau_b, params)
                V_C_a = V_matrix(dfn_a, dfs_aa, dft_a, grad_a, bfs, w, grads,
                                 grad_b, dfs_ab)
                V_C_b = V_matrix(dfn_b, dfs_bb, dft_b, grad_b, bfs, w, grads,
                                 grad_a, dfs_ab)
                E_c = jnp.sum(e_C * density * w) * DFC_prop

            V_XC_a = V_X_a * DFX_prop + V_C_a * DFC_prop
            V_XC_b = V_X_b * DFX_prop + V_C_b * DFC_prop
            return (V_XC_a, V_XC_b, E_x, E_c, density.ravel(),
                    dens_a.ravel(), dens_b.ravel())

    return xc_fn, needs_gradient


def make_xc_closure(calculation, grid_container):
    """Build the per-iteration XC evaluation used inside the SCF while_loop.

    Returns a callable (P_alpha, P_beta, HFX, DFX, DFC) ->
    (V_XC_alpha, V_XC_beta, E_x_grid, E_c_grid, density, alpha_density,
    beta_density), with the grid arrays closed over as jit constants
    (the serial path; batched paths feed make_xc_fn directly).
    """
    bfs_on_grid, weights, bf_gradients_on_grid, _ = grid_container
    xc_fn, _ = make_xc_fn(calculation)

    bfs = jnp.asarray(bfs_on_grid)
    w = jnp.asarray(weights)
    grads = (jnp.asarray(bf_gradients_on_grid)
             if bf_gradients_on_grid is not None else None)

    def closure(P_a, P_b, HFX_prop, DFX_prop, DFC_prop):
        return xc_fn(P_a, P_b, HFX_prop, DFX_prop, DFC_prop, bfs, w, grads)

    n_points = int(bfs.shape[1] * bfs.shape[2])
    closure.zero_density = lambda: jnp.zeros((n_points,))
    return closure
