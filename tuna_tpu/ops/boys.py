"""Vectorised Boys function F_n(T) in pure JAX, stable in float64.

The reference computes Boys values through scipy's cython hyp1f1
(tuna_integral.pyx:1490-1505, 1540-1572), which is unavailable on-device.
Here we use the standard two-regime scheme:

  T < T_SWITCH : Kummer series at the highest order, then downward recursion
                 F_{m-1} = (2T F_m + e^-T) / (2m - 1)      (stable downward)
  T >= T_SWITCH: F_0 = sqrt(pi/(4T)) erf(sqrt(T)), then upward recursion
                 F_{m+1} = ((2m+1) F_m - e^-T) / (2T)      (stable for large T)

Both branches are evaluated for every element (XLA select), keeping the
computation branch-free and batchable.  Accuracy ~1e-15 relative across the
full range used by molecular integrals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

T_SWITCH = 30.0
_N_SERIES_TERMS = 130


def boys_table(nmax: int, T: jnp.ndarray) -> jnp.ndarray:
    """Boys functions F_0..F_nmax of T.

    Args:
        nmax: highest order (static).
        T: any-shape array of non-negative arguments.

    Returns:
        array of shape T.shape + (nmax + 1,)
    """
    T = jnp.asarray(T)
    # Clamp each branch's argument into its own safe domain; selection at the
    # end picks the valid branch, so the clamped values never leak.
    T_small = jnp.minimum(T, T_SWITCH)
    T_large = jnp.maximum(T, T_SWITCH)

    exp_small = jnp.exp(-T_small)

    # --- small-T branch: series at nmax, then downward recursion ----------
    # F_m(T) = e^-T / (2m+1) * sum_k prod_{j=1..k} 2T / (2m + 2j + 1)
    two_T = 2.0 * T_small
    denominators = 2.0 * nmax + 2.0 * jnp.arange(1, _N_SERIES_TERMS + 1) + 1.0
    ratios = two_T[..., None] / denominators  # (..., K)
    series = 1.0 + jnp.sum(jnp.cumprod(ratios, axis=-1), axis=-1)
    F_top = exp_small * series / (2.0 * nmax + 1.0)

    downward = [F_top]
    for m in range(nmax, 0, -1):
        downward.append((two_T * downward[-1] + exp_small) / (2.0 * m - 1.0))
    F_small = jnp.stack(downward[::-1], axis=-1)  # (..., nmax+1), order 0..nmax

    # --- large-T branch: closed-form F_0, then upward recursion -----------
    sqrt_T = jnp.sqrt(T_large)
    F0 = jnp.sqrt(jnp.pi) / (2.0 * sqrt_T) * jax.scipy.special.erf(sqrt_T)
    exp_large = jnp.exp(-T_large)
    upward = [F0]
    for m in range(nmax):
        upward.append(((2.0 * m + 1.0) * upward[-1] - exp_large) / (2.0 * T_large))
    F_large = jnp.stack(upward, axis=-1)

    return jnp.where((T < T_SWITCH)[..., None], F_small, F_large)


@partial(jax.jit, static_argnums=0)
def boys_table_jit(nmax: int, T: jnp.ndarray) -> jnp.ndarray:
    return boys_table(nmax, T)
