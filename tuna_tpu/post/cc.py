"""Coupled cluster and iterative configuration interaction methods.

Capability parity with /root/reference/TUNA/tuna_cc.py: all iterative methods
run through one driver (calculate_coupled_cluster_energy) with amplitude DIIS
and damping.  Restricted methods use spin-adapted spatial-orbital equations
(physicists' notation g, antisymmetrised intermediate w = 2g - g^T); the
unrestricted path uses antisymmetrised spin-orbital equations (Stanton DPD
form).  Amplitude-update kernels are jit-compiled once per system shape and
lower to dot_general chains on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..output import error, log, log_spacer, timer
from . import transforms


def permute(array, idx_1, idx_2):
    """Antisymmetric permutation P-(idx_1, idx_2)."""
    return array - array.swapaxes(idx_1, idx_2)


def permute_symmetric(array, pair1, pair2):
    return array + array.swapaxes(*pair1).swapaxes(*pair2)


def permute_three_columns(array):
    return (array + array.transpose(0, 2, 1, 3, 5, 4) + array.transpose(1, 0, 2, 4, 3, 5)
            + array.transpose(1, 2, 0, 4, 5, 3) + array.transpose(2, 0, 1, 5, 3, 4)
            + array.transpose(2, 1, 0, 5, 4, 3))


# ---------------------------------------------------------------------------
# Energy expressions
# ---------------------------------------------------------------------------

_NO_DISCONNECTED = ("LCCD", "LCCSD", "QCISD", "QCISD[T]", "QCISD(T)", "CISD",
                    "CID", "CISDT")


def restricted_cc_energy(o, v, w, t_amplitudes, method, F):
    t_ia, t_ijab = t_amplitudes[0], t_amplitudes[1]
    E_singles = float(jnp.einsum("ia,ia->", F[o, v], t_ia, optimize=True)) \
        if t_ia is not None and F is not None else 0.0
    E_connected = float(jnp.einsum("abij,ijab->", w[v, v, o, o], t_ijab, optimize=True))
    E_disconnected = float(jnp.einsum("abij,ia,jb->", w[v, v, o, o], t_ia, t_ia,
                                      optimize=True)) if t_ia is not None else 0.0
    if method.name in _NO_DISCONNECTED:
        E_disconnected = 0.0
    return E_singles + E_connected + E_disconnected, E_singles, E_connected, E_disconnected


def unrestricted_cc_energy(o, v, g, t_amplitudes, method, F):
    t_ia, t_ijab = t_amplitudes[0], t_amplitudes[1]
    E_singles = float(jnp.einsum("ia,ia->", F[o, v], t_ia, optimize=True)) \
        if t_ia is not None and F is not None else 0.0
    E_connected = 0.25 * float(jnp.einsum("ijab,ijab->", g[o, o, v, v], t_ijab, optimize=True))
    E_disconnected = 0.5 * float(jnp.einsum("ijab,ia,jb->", g[o, o, v, v], t_ia, t_ia,
                                            optimize=True)) if t_ia is not None else 0.0
    if method.name in _NO_DISCONNECTED:
        E_disconnected = 0.0
    return E_singles + E_connected + E_disconnected, E_singles, E_connected, E_disconnected


# ---------------------------------------------------------------------------
# Convergence, damping and amplitude DIIS
# ---------------------------------------------------------------------------

def is_converged(delta_E, t_amplitudes, t_amplitudes_old, calculation):
    t_ia, t_ijab = t_amplitudes[0], t_amplitudes[1]
    t_ia_old, t_ijab_old = t_amplitudes_old[0], t_amplitudes_old[1]
    if abs(delta_E) >= calculation.energy_convergence:
        return False
    if float(jnp.linalg.norm(t_ijab - t_ijab_old)) >= calculation.amp_conv:
        return False
    if t_ia is not None and float(jnp.linalg.norm(t_ia - t_ia_old)) >= calculation.amp_conv:
        return False
    return True


def apply_damping(damping_factor, t_amplitudes, t_amplitudes_old):
    if damping_factor == 0:
        return t_amplitudes
    damped = []
    for t, t_old in zip(t_amplitudes, t_amplitudes_old):
        damped.append(None if t is None else
                      damping_factor * t_old + (1 - damping_factor) * t)
    return tuple(damped)


def apply_DIIS(t_amplitudes, t_amplitudes_old, t_history, error_history, step,
               calculation, silent):
    """Pulay extrapolation over the amplitude history (tuna_cc.py:334-498)."""
    residual_blocks = []
    snapshot = []
    for t, t_old in zip(t_amplitudes, t_amplitudes_old):
        if t is None or t_old is None:
            snapshot.append(None)
            continue
        snapshot.append(np.asarray(t))
        residual_blocks.append((np.asarray(t) - np.asarray(t_old)).ravel())

    t_history.append(snapshot)
    error_history.append(np.concatenate(residual_blocks))

    if len(error_history) > calculation.max_DIIS_matrices:
        del error_history[0]
        del t_history[0]

    if step <= 2 or not calculation.DIIS:
        return t_amplitudes

    errors = np.array(error_history)
    n = len(error_history)
    B = np.empty((n + 1, n + 1))
    B[:n, :n] = errors @ errors.T
    B[:n, -1] = -1
    B[-1, :n] = -1
    B[-1, -1] = 0.0
    rhs = np.zeros(n + 1)
    rhs[-1] = -1.0

    try:
        coeffs = np.linalg.solve(B, rhs)[:n]
    except np.linalg.LinAlgError:
        t_history.clear()
        error_history.clear()
        log("   (Resetting DIIS)", calculation, 1, end="", silent=silent)
        return t_amplitudes

    extrapolated = []
    for block in range(len(t_amplitudes)):
        if t_amplitudes[block] is None or t_history[0][block] is None:
            extrapolated.append(t_amplitudes[block])
        else:
            stack = np.array([snap[block] for snap in t_history])
            extrapolated.append(jnp.asarray(np.tensordot(coeffs, stack, axes=(0, 0))))
    return tuple(extrapolated)


# ---------------------------------------------------------------------------
# Restricted (spin-adapted) amplitude updates
# ---------------------------------------------------------------------------

def restricted_LCCD(g, o, v, t, e, w, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    tmp = 0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp += 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp += 2 * jnp.einsum("icak,kjcb->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp -= jnp.einsum("ciak,kjcb->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp -= jnp.einsum("icak,kjbc->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp -= jnp.einsum("cibk,kjac->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp += tmp.transpose(1, 0, 3, 2)
    return None, e_ijab * tmp, None, None


def restricted_CCD(g, o, v, t, e, w, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    F_ik = jnp.einsum("cdkl,ilcd->ik", w[v, v, o, o], t_ijab, optimize=True)
    F_ca = -jnp.einsum("cdkl,klad->ca", w[v, v, o, o], t_ijab, optimize=True)
    W_ijkl = g[o, o, o, o] + jnp.einsum("cdkl,ijcd->ijkl", g[v, v, o, o], t_ijab, optimize=True)
    W_icak = (g[o, v, v, o] - 0.5 * jnp.einsum("dclk,ilda->icak", g[v, v, o, o], t_ijab, optimize=True)
              + 0.5 * jnp.einsum("dclk,ilad->icak", w[v, v, o, o], t_ijab, optimize=True))
    W_ciak = g[v, o, v, o] - 0.5 * jnp.einsum("cdlk,ilda->ciak", g[v, v, o, o], t_ijab, optimize=True)

    tmp = 0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", W_ijkl, t_ijab, optimize=True)
    tmp += 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp += jnp.einsum("ca,ijcb->ijab", F_ca, t_ijab, optimize=True) - jnp.einsum("ik,kjab->ijab", F_ik, t_ijab, optimize=True)
    tmp += 2 * jnp.einsum("icak,kjcb->ijab", W_icak, t_ijab, optimize=True) - jnp.einsum("ciak,kjcb->ijab", W_ciak, t_ijab, optimize=True)
    tmp += -jnp.einsum("icak,kjbc->ijab", W_icak, t_ijab, optimize=True) - jnp.einsum("cibk,kjac->ijab", W_ciak, t_ijab, optimize=True)
    tmp += tmp.transpose(1, 0, 3, 2)
    return None, e_ijab * tmp, None, None


def restricted_LCCSD(g, o, v, t, e, w, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    tmp1 = jnp.einsum("icak,kc->ia", w[o, v, v, o], t_ia, optimize=True)
    tmp1 += jnp.einsum("cdak,ikcd->ia", w[v, v, v, o], t_ijab, optimize=True)
    tmp1 += -jnp.einsum("ickl,klac->ia", w[o, v, o, o], t_ijab, optimize=True)

    tmp2 = 0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp2 += 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp2 += jnp.einsum("icab,jc->ijab", g[o, v, v, v], t_ia, optimize=True) - jnp.einsum("ijak,kb->ijab", g[o, o, v, o], t_ia, optimize=True)
    tmp2 += 2 * jnp.einsum("icak,kjcb->ijab", g[o, v, v, o], t_ijab, optimize=True) - jnp.einsum("ciak,kjcb->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp2 += -jnp.einsum("icak,kjbc->ijab", g[o, v, v, o], t_ijab, optimize=True) - jnp.einsum("cibk,kjac->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp2 += tmp2.transpose(1, 0, 3, 2)
    return e_ia * tmp1, e_ijab * tmp2, None, None


def restricted_CID(g, o, v, t, e, w, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    tmp = 0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp += 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp += 2 * jnp.einsum("icak,kjcb->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp += -jnp.einsum("ciak,kjcb->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp += -jnp.einsum("icak,kjbc->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp += -jnp.einsum("cibk,kjac->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp += tmp.transpose(1, 0, 3, 2)
    E_corr = jnp.einsum("ijab,ijab->", g[o, o, v, v], 2 * t_ijab - t_ijab.swapaxes(2, 3), optimize=True)
    tmp -= E_corr * t_ijab
    return None, e_ijab * tmp, None, None


def restricted_CISD(g, o, v, t, e, w, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    tmp1 = jnp.einsum("icak,kc->ia", w[o, v, v, o], t_ia, optimize=True)
    tmp1 += -jnp.einsum("ickl,klac->ia", w[o, v, o, o], t_ijab, optimize=True)
    tmp1 += jnp.einsum("cdak,ikcd->ia", w[v, v, v, o], t_ijab, optimize=True)

    tmp2 = 0.5 * g[o, o, v, v] + jnp.einsum("icab,jc->ijab", g[o, v, v, v], t_ia, optimize=True)
    tmp2 += -jnp.einsum("ijak,kb->ijab", g[o, o, v, o], t_ia, optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp2 += 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp2 += 2 * jnp.einsum("icak,kjcb->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp2 += -jnp.einsum("ciak,kjcb->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp2 += -jnp.einsum("icak,kjbc->ijab", g[o, v, v, o], t_ijab, optimize=True)
    tmp2 += -jnp.einsum("cibk,kjac->ijab", g[v, o, v, o], t_ijab, optimize=True)
    tmp2 += tmp2.transpose(1, 0, 3, 2)

    E_corr = jnp.einsum("ijab,ijab->", g[o, o, v, v], 2 * t_ijab - t_ijab.swapaxes(2, 3), optimize=True)
    tmp1 -= E_corr * t_ia
    tmp2 -= E_corr * t_ijab
    return e_ia * tmp1, e_ijab * tmp2, None, None


def restricted_QCISD(g, o, v, t, e, w, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    F_ik = jnp.einsum("cdkl,ilcd->ik", w[v, v, o, o], t_ijab, optimize=True)
    F_ca = -jnp.einsum("cdkl,klad->ca", w[v, v, o, o], t_ijab, optimize=True)
    F_ck = jnp.einsum("cdkl,ld->ck", w[v, v, o, o], t_ia, optimize=True)
    W_ijkl = g[o, o, o, o] + jnp.einsum("cdkl,ijcd->ijkl", g[v, v, o, o], t_ijab, optimize=True)
    W_icak = (g[o, v, v, o] - 0.5 * jnp.einsum("dclk,ilda->icak", g[v, v, o, o], t_ijab, optimize=True)
              + 0.5 * jnp.einsum("dclk,ilad->icak", w[v, v, o, o], t_ijab, optimize=True))
    W_ciak = g[v, o, v, o] - 0.5 * jnp.einsum("cdlk,ilda->ciak", g[v, v, o, o], t_ijab, optimize=True)

    tmp1 = (jnp.einsum("ca,ic->ia", F_ca, t_ia, optimize=True) - jnp.einsum("ik,ka->ia", F_ik, t_ia, optimize=True)
            + jnp.einsum("ck,kica->ia", F_ck, 2 * t_ijab - t_ijab.swapaxes(0, 1), optimize=True))
    tmp1 += jnp.einsum("icak,kc->ia", w[o, v, v, o], t_ia, optimize=True) + jnp.einsum("cdak,ikcd->ia", w[v, v, v, o], t_ijab, optimize=True)
    tmp1 += -jnp.einsum("ickl,klac->ia", w[o, v, o, o], t_ijab, optimize=True)

    tmp2 = (0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", W_ijkl, t_ijab, optimize=True)
            + 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True))
    tmp2 += jnp.einsum("ca,ijcb->ijab", F_ca, t_ijab, optimize=True) - jnp.einsum("ik,kjab->ijab", F_ik, t_ijab, optimize=True)
    tmp2 += jnp.einsum("icab,jc->ijab", g[o, v, v, v], t_ia, optimize=True) - jnp.einsum("ijak,kb->ijab", g[o, o, v, o], t_ia, optimize=True)
    tmp2 += (2 * jnp.einsum("icak,kjcb->ijab", W_icak, t_ijab, optimize=True)
             - jnp.einsum("ciak,kjcb->ijab", W_ciak, t_ijab, optimize=True)
             - jnp.einsum("icak,kjbc->ijab", W_icak, t_ijab, optimize=True)
             - jnp.einsum("cibk,kjac->ijab", W_ciak, t_ijab, optimize=True))
    tmp2 += tmp2.transpose(1, 0, 3, 2)
    return e_ia * tmp1, e_ijab * tmp2, None, None


def restricted_CCSD(g, o, v, t, e, w, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e

    F_ik = (F[o, o] + jnp.einsum("cdkl,ilcd->ik", w[v, v, o, o], t_ijab, optimize=True)
            + jnp.einsum("cdkl,ic,ld->ik", w[v, v, o, o], t_ia, t_ia, optimize=True))
    F_ca = (F[v, v] - jnp.einsum("cdkl,klad->ca", w[v, v, o, o], t_ijab, optimize=True)
            - jnp.einsum("cdkl,ka,ld->ca", w[v, v, o, o], t_ia, t_ia, optimize=True))
    F_ck = jnp.einsum("cdkl,ld->ck", w[v, v, o, o], t_ia, optimize=True)

    L_ik = F_ik + jnp.einsum("cilk,lc->ik", w[v, o, o, o], t_ia, optimize=True)
    L_ca = F_ca + jnp.einsum("dcka,kd->ca", w[v, v, o, v], t_ia, optimize=True)

    W_ijkl = (g[o, o, o, o] + jnp.einsum("cilk,jc->ijkl", g[v, o, o, o], t_ia, optimize=True)
              + jnp.einsum("cjkl,ic->ijkl", g[v, o, o, o], t_ia, optimize=True))
    W_ijkl += (jnp.einsum("cdkl,ijcd->ijkl", g[v, v, o, o], t_ijab, optimize=True)
               + jnp.einsum("cdkl,ic,jd->ijkl", g[v, v, o, o], t_ia, t_ia, optimize=True))

    W_cdab = (g[v, v, v, v] - jnp.einsum("dcka,kb->cdab", g[v, v, o, v], t_ia, optimize=True)
              - jnp.einsum("cdkb,ka->cdab", g[v, v, o, v], t_ia, optimize=True))

    W_icak = (g[o, v, v, o] - jnp.einsum("cikl,la->icak", g[v, o, o, o], t_ia, optimize=True)
              + jnp.einsum("cdka,id->icak", g[v, v, o, v], t_ia, optimize=True))
    W_icak += (-0.5 * jnp.einsum("dclk,ilda->icak", g[v, v, o, o], t_ijab, optimize=True)
               - jnp.einsum("dclk,id,la->icak", g[v, v, o, o], t_ia, t_ia, optimize=True))
    W_icak += 0.5 * jnp.einsum("dclk,ilad->icak", w[v, v, o, o], t_ijab, optimize=True)

    W_ciak = (g[v, o, v, o] - jnp.einsum("cilk,la->ciak", g[v, o, o, o], t_ia, optimize=True)
              + jnp.einsum("dcka,id->ciak", g[v, v, o, v], t_ia, optimize=True))
    W_ciak += (-0.5 * jnp.einsum("cdlk,ilda->ciak", g[v, v, o, o], t_ijab, optimize=True)
               - jnp.einsum("cdlk,id,la->ciak", g[v, v, o, o], t_ia, t_ia, optimize=True))

    tmp1 = (jnp.einsum("ca,ic->ia", F_ca - F[v, v], t_ia, optimize=True)
            - jnp.einsum("ik,ka->ia", F_ik - F[o, o], t_ia, optimize=True))
    tmp1 += (-jnp.einsum("ickl,klac->ia", w[o, v, o, o], t_ijab, optimize=True)
             - jnp.einsum("ickl,ka,lc->ia", w[o, v, o, o], t_ia, t_ia, optimize=True))
    tmp1 += jnp.einsum("ck,kica->ia", F_ck, 2 * t_ijab - t_ijab.swapaxes(0, 1), optimize=True)
    tmp1 += jnp.einsum("ck,ic,ka->ia", F_ck, t_ia, t_ia, optimize=True)
    tmp1 += jnp.einsum("icak,kc->ia", w[o, v, v, o], t_ia, optimize=True)
    tmp1 += jnp.einsum("cdak,ikcd->ia", w[v, v, v, o], t_ijab, optimize=True)
    tmp1 += jnp.einsum("cdak,ic,kd->ia", w[v, v, v, o], t_ia, t_ia, optimize=True)

    tmp2 = 0.5 * g[o, o, v, v] + 0.5 * jnp.einsum("ijkl,klab->ijab", W_ijkl, t_ijab, optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijkl,ka,lb->ijab", W_ijkl, t_ia, t_ia, optimize=True)
    tmp2 += 0.5 * jnp.einsum("cdab,ijcd->ijab", W_cdab, t_ijab, optimize=True)
    tmp2 += 0.5 * jnp.einsum("cdab,ic,jd->ijab", W_cdab, t_ia, t_ia, optimize=True)
    tmp2 += jnp.einsum("ca,ijcb->ijab", L_ca - F[v, v], t_ijab, optimize=True)
    tmp2 += -jnp.einsum("ik,kjab->ijab", L_ik - F[o, o], t_ijab, optimize=True)
    tmp2 += jnp.einsum("icab,jc->ijab", g[o, v, v, v], t_ia, optimize=True)
    tmp2 += -jnp.einsum("ickb,ka,jc->ijab", g[o, v, o, v], t_ia, t_ia, optimize=True)
    tmp2 += -jnp.einsum("ijak,kb->ijab", g[o, o, v, o], t_ia, optimize=True)
    tmp2 += -jnp.einsum("icak,jc,kb->ijab", g[o, v, v, o], t_ia, t_ia, optimize=True)
    tmp2 += 2 * jnp.einsum("icak,kjcb->ijab", W_icak, t_ijab, optimize=True)
    tmp2 += -jnp.einsum("ciak,kjcb->ijab", W_ciak, t_ijab, optimize=True)
    tmp2 += -jnp.einsum("icak,kjbc->ijab", W_icak, t_ijab, optimize=True)
    tmp2 += -jnp.einsum("cibk,kjac->ijab", W_ciak, t_ijab, optimize=True)
    tmp2 += tmp2.transpose(1, 0, 3, 2)

    return e_ia * tmp1, e_ijab * tmp2, None, None


# ---------------------------------------------------------------------------
# Unrestricted (spin-orbital) amplitude updates
# ---------------------------------------------------------------------------

def unrestricted_LCCD(g, o, v, t, e, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    tmp = g[o, o, v, v] + 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp += 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp += permute(permute(jnp.einsum("icak,jkbc->ijab", g[o, v, v, o], t_ijab, optimize=True), 2, 3), 0, 1)
    return None, e_ijab * tmp, None, None


def unrestricted_CCD(g, o, v, t, e, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    tmp = g[o, o, v, v] + 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp += 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp += permute(permute(jnp.einsum("icak,jkbc->ijab", g[o, v, v, o], t_ijab, optimize=True), 2, 3), 0, 1)
    tmp += -0.5 * permute(jnp.einsum("cdkl,ijac,klbd->ijab", g[v, v, o, o], t_ijab, t_ijab, optimize=True), 2, 3)
    tmp += -0.5 * permute(jnp.einsum("cdkl,ikab,jlcd->ijab", g[v, v, o, o], t_ijab, t_ijab, optimize=True), 0, 1)
    tmp += 0.25 * jnp.einsum("cdkl,ijcd,klab->ijab", g[v, v, o, o], t_ijab, t_ijab, optimize=True)
    tmp += permute(jnp.einsum("cdkl,ikac,jlbd->ijab", g[v, v, o, o], t_ijab, t_ijab, optimize=True), 0, 1)
    return None, e_ijab * tmp, None, None


def unrestricted_LCCSD(g, o, v, t, e, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    tmp1 = F[o, v] + jnp.einsum("ac,ic->ia", F[v, v], t_ia, optimize=True)
    tmp1 += jnp.einsum("kc,ikac->ia", F[o, v], t_ijab, optimize=True) - jnp.einsum("ki,ka->ia", F[o, o], t_ia, optimize=True)
    tmp1 += jnp.einsum("kaci,kc->ia", g[o, v, v, o], t_ia, optimize=True)
    tmp1 += 0.5 * jnp.einsum("kacd,kicd->ia", g[o, v, v, v], t_ijab, optimize=True) - 0.5 * jnp.einsum("klci,klca->ia", g[o, o, v, o], t_ijab, optimize=True)

    tmp2 = g[o, o, v, v] + 0.5 * jnp.einsum("cdab,ijcd->ijab", g[v, v, v, v], t_ijab, optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijkl,klab->ijab", g[o, o, o, o], t_ijab, optimize=True)
    tmp2 += permute(permute(jnp.einsum("icak,jkbc->ijab", g[o, v, v, o], t_ijab, optimize=True), 2, 3), 0, 1)
    tmp2 += permute(jnp.einsum("bc,ijac->ijab", F[v, v], t_ijab, optimize=True), 2, 3)
    tmp2 += -permute(jnp.einsum("kj,ikab->ijab", F[o, o], t_ijab, optimize=True), 0, 1)
    tmp2 += permute(jnp.einsum("abcj,ic->ijab", g[v, v, v, o], t_ia, optimize=True), 0, 1)
    tmp2 += -permute(jnp.einsum("kbij,ka->ijab", g[o, v, o, o], t_ia, optimize=True), 2, 3)

    # Incremental update (reference quirk, tuna_cc.py:1118-1119)
    return t_ia + e_ia * tmp1, t_ijab + e_ijab * tmp2, None, None


def unrestricted_CID(g, o, v, t, e, F):
    _, t_ijab, _, _ = t
    _, e_ijab, _, _ = e
    delta = jnp.eye(F.shape[1])
    F_ae = F[v, v] - delta[v, v] * F[v, v]
    tmp = g[o, o, v, v] + permute(jnp.einsum("ijae,be->ijab", t_ijab, F_ae, optimize=True), 2, 3)
    tmp += 0.5 * jnp.einsum("mnab,mnij->ijab", t_ijab, g[o, o, o, o], optimize=True)
    tmp += 0.5 * jnp.einsum("ijef,abef->ijab", t_ijab, g[v, v, v, v], optimize=True)
    tmp += permute(permute(jnp.einsum("imae,mbej->ijab", t_ijab, g[o, v, v, o], optimize=True), 2, 3), 0, 1)
    E_corr = 0.25 * jnp.einsum("ijab,ijab->", g[o, o, v, v], t_ijab, optimize=True)
    tmp -= E_corr * t_ijab
    return None, e_ijab * tmp, None, None


def unrestricted_CISD(g, o, v, t, e, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    delta = jnp.eye(F.shape[1])
    F_ae = F[v, v] - delta[v, v] * F[v, v]
    F_mi = F[o, o] - delta[o, o] * F[o, o]

    tmp1 = F[o, v] + jnp.einsum("ie,ae->ia", t_ia, F_ae, optimize=True) - jnp.einsum("ma,mi->ia", t_ia, F_mi, optimize=True)
    tmp1 += jnp.einsum("imae,me->ia", t_ijab, F[o, v], optimize=True) - jnp.einsum("nf,naif->ia", t_ia, g[o, v, o, v], optimize=True)
    tmp1 += -0.5 * jnp.einsum("imef,maef->ia", t_ijab, g[o, v, v, v], optimize=True) - 0.5 * jnp.einsum("mnae,nmei->ia", t_ijab, g[o, o, v, o], optimize=True)

    tmp2 = g[o, o, v, v] + permute(jnp.einsum("ijae,be->ijab", t_ijab, F_ae, optimize=True), 2, 3)
    tmp2 += 0.5 * jnp.einsum("mnab,mnij->ijab", t_ijab, g[o, o, o, o], optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijef,abef->ijab", t_ijab, g[v, v, v, v], optimize=True)
    tmp2 += permute(permute(jnp.einsum("imae,mbej->ijab", t_ijab, g[o, v, v, o], optimize=True), 2, 3), 0, 1)
    tmp2 += permute(jnp.einsum("ie,abej->ijab", t_ia, g[v, v, v, o], optimize=True), 0, 1)
    tmp2 += -permute(jnp.einsum("ma,mbij->ijab", t_ia, g[o, v, o, o], optimize=True), 2, 3)

    E_corr = 0.25 * jnp.einsum("ijab,ijab->", g[o, o, v, v], t_ijab, optimize=True)
    tmp1 -= E_corr * t_ia
    tmp2 -= E_corr * t_ijab
    return e_ia * tmp1, e_ijab * tmp2, None, None


def unrestricted_QCISD(g, o, v, t, e, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    delta = jnp.eye(F.shape[1])
    F_ae = F[v, v] - delta[v, v] * F[v, v] - 0.5 * jnp.einsum("mnaf,mnef->ae", t_ijab, g[o, o, v, v], optimize=True)
    F_mi = F[o, o] - delta[o, o] * F[o, o] + 0.5 * jnp.einsum("inef,mnef->mi", t_ijab, g[o, o, v, v], optimize=True)
    F_me = F[o, v] + jnp.einsum("nf,mnef->me", t_ia, g[o, o, v, v], optimize=True)

    W_mnij = g[o, o, o, o] + 0.25 * jnp.einsum("ijef,mnef->mnij", t_ijab, g[o, o, v, v], optimize=True)
    W_abef = g[v, v, v, v] + 0.25 * jnp.einsum("mnab,mnef->abef", t_ijab, g[o, o, v, v], optimize=True)
    W_mbej = g[o, v, v, o] - jnp.einsum("jnfb,mnef->mbej", 0.5 * t_ijab, g[o, o, v, v], optimize=True)

    tmp1 = F[o, v] + jnp.einsum("ie,ae->ia", t_ia, F_ae, optimize=True) - jnp.einsum("ma,mi->ia", t_ia, F_mi, optimize=True)
    tmp1 += jnp.einsum("imae,me->ia", t_ijab, F_me, optimize=True) - jnp.einsum("nf,naif->ia", t_ia, g[o, v, o, v], optimize=True)
    tmp1 += -0.5 * jnp.einsum("imef,maef->ia", t_ijab, g[o, v, v, v], optimize=True) - 0.5 * jnp.einsum("mnae,nmei->ia", t_ijab, g[o, o, v, o], optimize=True)

    tmp2 = g[o, o, v, v] + permute(jnp.einsum("ijae,be->ijab", t_ijab, F_ae, optimize=True), 2, 3)
    tmp2 += -permute(jnp.einsum("imab,mj->ijab", t_ijab, F_mi, optimize=True), 0, 1)
    tmp2 += 0.5 * jnp.einsum("mnab,mnij->ijab", t_ijab, W_mnij, optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijef,abef->ijab", t_ijab, W_abef, optimize=True)
    tmp2 += permute(permute(jnp.einsum("imae,mbej->ijab", t_ijab, W_mbej, optimize=True), 2, 3), 0, 1)
    tmp2 += permute(jnp.einsum("ie,abej->ijab", t_ia, g[v, v, v, o], optimize=True), 0, 1)
    tmp2 += -permute(jnp.einsum("ma,mbij->ijab", t_ia, g[o, v, o, o], optimize=True), 2, 3)
    return e_ia * tmp1, e_ijab * tmp2, None, None


def unrestricted_CCSD(g, o, v, t, e, F):
    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, _, _ = e
    delta = jnp.eye(F.shape[1])

    tau_tilde = t_ijab + 0.5 * (jnp.einsum("ia,jb->ijab", t_ia, t_ia, optimize=True)
                                - jnp.einsum("ib,ja->ijab", t_ia, t_ia, optimize=True))
    tau = t_ijab + (jnp.einsum("ia,jb->ijab", t_ia, t_ia, optimize=True)
                    - jnp.einsum("ib,ja->ijab", t_ia, t_ia, optimize=True))

    F_ae = F[v, v] - delta[v, v] * F[v, v] - 0.5 * jnp.einsum("me,ma->ae", F[o, v], t_ia, optimize=True)
    F_ae += (jnp.einsum("mf,mafe->ae", t_ia, g[o, v, v, v], optimize=True)
             - 0.5 * jnp.einsum("mnaf,mnef->ae", tau_tilde, g[o, o, v, v], optimize=True))
    F_mi = F[o, o] - delta[o, o] * F[o, o] + 0.5 * jnp.einsum("ie,me->mi", t_ia, F[o, v], optimize=True)
    F_mi += (jnp.einsum("ne,mnie->mi", t_ia, g[o, o, o, v], optimize=True)
             + 0.5 * jnp.einsum("inef,mnef->mi", tau_tilde, g[o, o, v, v], optimize=True))
    F_me = F[o, v] + jnp.einsum("nf,mnef->me", t_ia, g[o, o, v, v], optimize=True)

    W_mnij = g[o, o, o, o] + permute(jnp.einsum("je,mnie->mnij", t_ia, g[o, o, o, v], optimize=True), 2, 3)
    W_mnij += 0.25 * jnp.einsum("ijef,mnef->mnij", tau, g[o, o, v, v], optimize=True)
    W_abef = g[v, v, v, v] - permute(jnp.einsum("mb,amef->abef", t_ia, g[v, o, v, v], optimize=True), 0, 1)
    W_abef += 0.25 * jnp.einsum("mnab,mnef->abef", tau, g[o, o, v, v], optimize=True)
    W_mbej = g[o, v, v, o] + jnp.einsum("jf,mbef->mbej", t_ia, g[o, v, v, v], optimize=True)
    W_mbej += -jnp.einsum("nb,mnej->mbej", t_ia, g[o, o, v, o], optimize=True)
    W_mbej += -jnp.einsum("jnfb,mnef->mbej",
                          0.5 * t_ijab + jnp.einsum("jf,nb->jnfb", t_ia, t_ia, optimize=True),
                          g[o, o, v, v], optimize=True)

    tmp1 = F[o, v] + jnp.einsum("ie,ae->ia", t_ia, F_ae, optimize=True) - jnp.einsum("ma,mi->ia", t_ia, F_mi, optimize=True)
    tmp1 += jnp.einsum("imae,me->ia", t_ijab, F_me, optimize=True) - jnp.einsum("nf,naif->ia", t_ia, g[o, v, o, v], optimize=True)
    tmp1 += -0.5 * jnp.einsum("imef,maef->ia", t_ijab, g[o, v, v, v], optimize=True) - 0.5 * jnp.einsum("mnae,nmei->ia", t_ijab, g[o, o, v, o], optimize=True)

    tmp2 = g[o, o, v, v] + permute(jnp.einsum(
        "ijae,be->ijab", t_ijab,
        F_ae - 0.5 * jnp.einsum("mb,me->be", t_ia, F_me, optimize=True), optimize=True), 2, 3)
    tmp2 += -permute(jnp.einsum(
        "imab,mj->ijab", t_ijab,
        F_mi + 0.5 * jnp.einsum("je,me->mj", t_ia, F_me, optimize=True), optimize=True), 0, 1)
    tmp2 += 0.5 * jnp.einsum("mnab,mnij->ijab", tau, W_mnij, optimize=True)
    tmp2 += 0.5 * jnp.einsum("ijef,abef->ijab", tau, W_abef, optimize=True)
    tmp2 += permute(permute(
        jnp.einsum("imae,mbej->ijab", t_ijab, W_mbej, optimize=True)
        - jnp.einsum("ie,ma,mbej->ijab", t_ia, t_ia, g[o, v, v, o], optimize=True), 2, 3), 0, 1)
    tmp2 += permute(jnp.einsum("ie,abej->ijab", t_ia, g[v, v, v, o], optimize=True), 0, 1)
    tmp2 += -permute(jnp.einsum("ma,mbij->ijab", t_ia, g[o, v, o, o], optimize=True), 2, 3)
    return e_ia * tmp1, e_ijab * tmp2, None, None


# ---------------------------------------------------------------------------
# T1-dressed restricted CC2 / CC3
# ---------------------------------------------------------------------------

def _t1_dress(molecular_orbitals, t_ia, o, v):
    C = jnp.asarray(molecular_orbitals)
    X = C.at[:, v].add(-C[:, o] @ t_ia)
    Y = C.at[:, o].add(C[:, v] @ t_ia.T)
    return X, Y


def restricted_CC2(o, v, t, e, molecular_orbitals, integrals):
    t_ia, _, _, _ = t
    e_ia, e_ijab, _, _ = e
    X, Y = _t1_dress(molecular_orbitals, t_ia, o, v)
    ERI_AO = jnp.asarray(integrals.ERI_AO)
    h_hat = jnp.einsum("ap,bq,ab->pq", X, Y, jnp.asarray(integrals.H_core), optimize=True)

    g_vovo = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X[:, v], Y[:, o], X[:, v], Y[:, o], ERI_AO, optimize=True)
    g_ovvv = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X[:, o], Y[:, v], X[:, v], Y[:, v], ERI_AO, optimize=True)
    g_ooov = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X[:, o], Y[:, o], X[:, o], Y[:, v], ERI_AO, optimize=True)
    g_oovo = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X[:, o], Y[:, o], X[:, v], Y[:, o], ERI_AO, optimize=True)
    g_ovoo = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X[:, o], Y[:, v], X[:, o], Y[:, o], ERI_AO, optimize=True)

    F_vo = h_hat[v, o] + 2 * jnp.einsum("kkai->ai", g_oovo, optimize=True) - jnp.einsum("kiak->ai", g_oovo, optimize=True)
    F_ov = h_hat[o, v] + 2 * jnp.einsum("kkia->ia", g_ooov, optimize=True) - jnp.einsum("kaik->ia", g_ovoo, optimize=True)

    t_ijab = g_vovo.transpose(1, 3, 0, 2) * e_ijab
    u_ijab = 2 * t_ijab - t_ijab.swapaxes(2, 3)

    A_ia = jnp.einsum("kicd,kcad->ia", u_ijab, g_ovvv, optimize=True)
    B_ia = -jnp.einsum("klac,kilc->ia", u_ijab, g_ooov, optimize=True)
    C_ia = jnp.einsum("kc,ikac->ia", F_ov, u_ijab, optimize=True)
    residual_ia = F_vo.swapaxes(0, 1) + A_ia + B_ia + C_ia

    return t_ia + e_ia * residual_ia, t_ijab, None, None


def restricted_CC3(o, v, t, e, molecular_orbitals, integrals):
    from .mp import second_order_triples_amplitudes

    t_ia, t_ijab, _, _ = t
    e_ia, e_ijab, e_ijkabc, _ = e
    X, Y = _t1_dress(molecular_orbitals, t_ia, o, v)
    ERI_AO = jnp.asarray(integrals.ERI_AO)
    g_hat = jnp.einsum("ap,bq,gr,ds,abgd->pqrs", X, Y, X, Y, ERI_AO, optimize=True)
    h_hat = jnp.einsum("ap,bq,ab->pq", X, Y, jnp.asarray(integrals.H_core), optimize=True)

    l_hat = 2 * g_hat - g_hat.swapaxes(1, 3)
    u_ijab = 2 * t_ijab - t_ijab.swapaxes(2, 3)
    occ_all = slice(0, o.stop)
    F_hat = h_hat + jnp.einsum("kkpq->pq", l_hat[occ_all, occ_all, :, :], optimize=True)

    A_ia = jnp.einsum("kicd,kcad->ia", u_ijab, g_hat[o, v, v, v], optimize=True)
    B_ia = -jnp.einsum("klac,kilc->ia", u_ijab, g_hat[o, o, o, v], optimize=True)
    C_ia = jnp.einsum("kc,ikac->ia", F_hat[o, v], u_ijab, optimize=True)

    beta_ijkl = g_hat[o, o, o, o].transpose(1, 3, 0, 2) + jnp.einsum("ijcd,kcld->ijkl", t_ijab, g_hat[o, v, o, v], optimize=True)
    gamma_kiac = g_hat[o, o, v, v] - 0.5 * jnp.einsum("liad,kdlc->kiac", t_ijab, g_hat[o, v, o, v], optimize=True)
    delta_aikc = 2 * g_hat[v, o, o, v] - g_hat[o, o, v, v].transpose(2, 1, 0, 3)
    delta_aikc += 0.5 * jnp.einsum("ilad,ldkc->aikc", u_ijab,
                                   2 * g_hat[o, v, o, v] - g_hat[o, v, o, v].swapaxes(1, 3), optimize=True)
    Ftt_bc = F_hat[v, v] - jnp.einsum("klbd,ldkc->bc", u_ijab, g_hat[o, v, o, v], optimize=True)
    Ftt_kj = F_hat[o, o] + jnp.einsum("ljcd,kdlc->kj", u_ijab, g_hat[o, v, o, v], optimize=True)

    A_ijab = jnp.einsum("ijcd,acbd->ijab", t_ijab, g_hat[v, v, v, v], optimize=True)
    B_ijab = jnp.einsum("klab,ijkl->ijab", t_ijab, beta_ijkl, optimize=True)
    C_ijab = -jnp.einsum("kjbc,kiac->ijab", t_ijab, gamma_kiac, optimize=True)
    D_ijab = 0.5 * jnp.einsum("jkbc,aikc->ijab", u_ijab, delta_aikc, optimize=True)
    E_ijab = jnp.einsum("ijac,bc->ijab", t_ijab, Ftt_bc, optimize=True)
    G_ijab = -jnp.einsum("ikab,kj->ijab", t_ijab, Ftt_kj, optimize=True)

    t_ijkabc = second_order_triples_amplitudes(e_ijkabc, t_ijab, g_hat, o, v)
    u_ijkabc = 2 * t_ijkabc - t_ijkabc.swapaxes(3, 4) - t_ijkabc.swapaxes(3, 5)

    temp_ijab = jnp.einsum("kc,ijkabc->ijab", F_hat[o, v], t_ijkabc - t_ijkabc.swapaxes(4, 5), optimize=True)
    temp_ijab += jnp.einsum("ackd,ijkcbd->ijab", g_hat[v, v, o, v],
                            2 * t_ijkabc - t_ijkabc.swapaxes(4, 5) - t_ijkabc.swapaxes(3, 5), optimize=True)
    temp_ijab += -jnp.einsum("kilc,ljkcba->ijab", g_hat[o, o, o, v], u_ijkabc, optimize=True)

    residual_ia = F_hat[v, o].swapaxes(0, 1) + A_ia + B_ia + C_ia
    residual_ijab = g_hat[v, o, v, o].transpose(1, 3, 0, 2) + A_ijab + B_ijab
    residual_ijab += permute_symmetric(0.5 * C_ijab + C_ijab.swapaxes(0, 1) + D_ijab + E_ijab + G_ijab, (0, 1), (2, 3))
    residual_ia += jnp.einsum("jbkc,ijkabc->ia", l_hat[o, v, o, v], t_ijkabc - t_ijkabc.swapaxes(3, 4), optimize=True)
    residual_ijab += permute_symmetric(temp_ijab, (0, 1), (2, 3))

    return t_ia + e_ia * residual_ia, t_ijab + e_ijab * residual_ijab, None, None


# ---------------------------------------------------------------------------
# Perturbative triples and quadruples
# ---------------------------------------------------------------------------

def restricted_CCSD_T(g, e_ijkabc, t_ia, t_ijab, o, v, method, calculation, silent):
    """(T) via the spin-adapted Lee formulation (tuna_cc.py:2688-2758)."""
    method.name = method.name.replace("[", "(").replace("]", ")")
    log_spacer(calculation, silent=silent, start="\n")
    log(f"                    {method.name} Energy ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    def P_ijkabc(array):
        return (array + array.transpose(1, 0, 2, 4, 3, 5) + array.transpose(2, 1, 0, 5, 4, 3)
                + array.transpose(0, 2, 1, 3, 5, 4) + array.transpose(2, 0, 1, 5, 3, 4)
                + array.transpose(1, 2, 0, 4, 5, 3))

    log("  Forming disconnected amplitudes...         ", calculation, 1, end="", silent=silent)
    V_ijkabc = jnp.einsum("jkbc,ia->ijkabc", g[o, o, v, v], t_ia, optimize=True)
    V_ijkabc += jnp.einsum("ikac,jb->ijkabc", g[o, o, v, v], t_ia, optimize=True)
    V_ijkabc += jnp.einsum("ijab,kc->ijkabc", g[o, o, v, v], t_ia, optimize=True)
    space = " "
    if "QCISD" in method.name:
        V_ijkabc = V_ijkabc * 2
        space = ""
    log("[Done]", calculation, 1, silent=silent)

    log("  Forming connected amplitudes...            ", calculation, 1, end="", silent=silent)
    W_ijkabc = P_ijkabc(jnp.einsum("ibaf,kjcf->ijkabc", g[o, v, v, v], t_ijab, optimize=True)
                        - jnp.einsum("ijam,mkbc->ijkabc", g[o, o, v, o], t_ijab, optimize=True))
    W = (4 * W_ijkabc + W_ijkabc.transpose(2, 0, 1, 3, 4, 5) + W_ijkabc.transpose(1, 2, 0, 3, 4, 5)
         - 4 * W_ijkabc.transpose(2, 1, 0, 3, 4, 5) - W_ijkabc.transpose(0, 2, 1, 3, 4, 5)
         - W_ijkabc.transpose(1, 0, 2, 3, 4, 5))
    log("[Done]", calculation, 1, silent=silent)

    log(f"\n  Calculating {method.name} correlation energy... {space}", calculation, 1, end="", silent=silent)
    E_T = (1 / 3) * float(jnp.einsum("ijkabc,ijkabc,ijkabc->", W_ijkabc + V_ijkabc, W, e_ijkabc, optimize=True))
    log(f"[Done]\n\n  {method.name} correlation energy:       {space} {E_T:13.10f}", calculation, 1, silent=silent)
    return E_T


def unrestricted_CCSD_T(g, e_ijkabc, t_ia, t_ijab, o, v, method, calculation, silent):
    """(T) via the spin-orbital Crawford formulation (tuna_cc.py:2769-2837)."""
    method.name = method.name.replace("[", "(").replace("]", ")")
    log_spacer(calculation, silent=silent, start="\n")
    log(f"                   {method.name} Energy  ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)

    def permute_three(array, idx1, idx2, idx3):
        return array - array.swapaxes(idx1, idx2) - array.swapaxes(idx1, idx3)

    log("  Forming disconnected amplitudes...         ", calculation, 1, end="", silent=silent)
    d_ijkabc = jnp.einsum("ia,jkbc->ijkabc", t_ia, g[o, o, v, v], optimize=True)
    t_d = e_ijkabc * permute_three(permute_three(d_ijkabc, 3, 4, 5), 0, 1, 2)
    space = " "
    if "QCISD" in method.name:
        t_d = t_d * 2
        space = ""
    log("[Done]", calculation, 1, silent=silent)

    log("  Forming connected amplitudes...            ", calculation, 1, end="", silent=silent)
    conn = (jnp.einsum("jkae,eibc->ijkabc", t_ijab, g[v, o, v, v], optimize=True)
            - jnp.einsum("imbc,majk->ijkabc", t_ijab, g[o, v, o, o], optimize=True))
    t_c = e_ijkabc * permute_three(permute_three(conn, 3, 4, 5), 0, 1, 2)
    log("[Done]", calculation, 1, silent=silent)

    log(f"\n  Calculating {method.name} correlation energy... {space}", calculation, 1, end="", silent=silent)
    E_T = (1 / 36) * float(jnp.einsum("ijkabc,ijkabc->", t_c / e_ijkabc, t_c + t_d, optimize=True))
    log(f"[Done]\n\n  {method.name} correlation energy:       {space} {E_T:13.10f}", calculation, 1, silent=silent)
    return E_T


# ---------------------------------------------------------------------------
# Post-processing
# ---------------------------------------------------------------------------

def linearised_density(t_ia, t_ijab, n_orbitals, n_occ, o, v, calculation,
                       molecular_orbitals, silent):
    log("\n  Constructing linearised density...    ", calculation, 1, end="", silent=silent)
    P_CC = jnp.zeros((n_orbitals, n_orbitals))

    if calculation.reference == "RHF":
        u_ijab = 2 * t_ijab - t_ijab.swapaxes(2, 3)
        P_CC = P_CC.at[v, v].add(jnp.einsum("ijbc,ijac->ab", t_ijab, u_ijab, optimize=True))
        P_CC = P_CC.at[o, o].add(-jnp.einsum("ikab,jkab->ij", t_ijab, u_ijab, optimize=True))
        P_CC = P_CC.at[o, v].add(t_ia + jnp.einsum("ijab,jb->ia", u_ijab, t_ia, optimize=True))
    else:
        P_CC = P_CC.at[v, v].add(0.5 * jnp.einsum("ijbc,ijac->ab", t_ijab, t_ijab, optimize=True))
        P_CC = P_CC.at[o, o].add(-0.5 * jnp.einsum("ikab,jkab->ij", t_ijab, t_ijab, optimize=True))
        P_CC = P_CC.at[o, v].add(t_ia + jnp.einsum("ijab,jb->ia", t_ijab, t_ia, optimize=True))

    P_CC = P_CC.at[v, o].set(P_CC[o, v].T)
    P_CC = P_CC.at[v, v].add(jnp.einsum("ia,ib->ab", t_ia, t_ia, optimize=True))
    P_CC = P_CC.at[o, o].add(-jnp.einsum("ia,ja->ij", t_ia, t_ia, optimize=True))

    P_ref = jnp.zeros((n_orbitals, n_orbitals)).at[:n_occ, :n_occ].set(jnp.eye(n_occ))
    P = P_ref + P_CC

    if calculation.reference == "UHF":
        P, P_alpha, P_beta = transforms.density_so_to_ao(P, jnp.asarray(molecular_orbitals), n_orbitals)
    else:
        P = 2 * P
        C = jnp.asarray(molecular_orbitals)
        P = C @ P @ C.T
        P_alpha = P_beta = P / 2
    log("     [Done]", calculation, 1, silent=silent)
    return P, P_alpha, P_beta


def T1_diagnostic(molecule, t_ia, spin_labels_sorted, n_occ, n_alpha, n_beta,
                  calculation, silent):
    t_ia = np.asarray(t_ia)
    if calculation.reference == "UHF":
        alpha_idx = [i for i, s in enumerate(spin_labels_sorted) if s == "a" and i < n_occ]
        beta_idx = [i for i, s in enumerate(spin_labels_sorted) if s == "b" and i < n_occ]
        alpha_idx = np.array(alpha_idx[molecule.n_core_alpha_electrons:]) - molecule.n_core_spin_orbitals
        beta_idx = np.array(beta_idx[molecule.n_core_beta_electrons:]) - molecule.n_core_spin_orbitals
        t_alpha = np.array([t_ia[i] for i in alpha_idx]) if len(alpha_idx) else np.zeros((0,))
        t_beta = np.array([t_ia[i] for i in beta_idx]) if len(beta_idx) else np.zeros((0,))
        n_alpha -= molecule.n_core_alpha_electrons
        n_beta -= molecule.n_core_beta_electrons
        n_occ -= molecule.n_core_alpha_electrons + molecule.n_core_beta_electrons
        t_norm = (n_alpha / n_occ * np.linalg.norm(t_alpha)
                  + n_beta / n_occ * np.linalg.norm(t_beta))
    else:
        n_occ -= molecule.n_core_orbitals
        n_occ *= 2
        t_norm = np.linalg.norm(t_ia)

    T1 = t_norm / np.sqrt(n_occ)
    log(f"\n  Norm of singles amplitudes:         {t_norm:13.10f}", calculation, 1, silent=silent)
    log(f"  Value of T1 diagnostic:             {T1:13.10f}", calculation, 1, silent=silent)
    return T1


def print_largest_amplitudes(t_ia, t_ijab, n_occ, calculation, spin_orbital_labels,
                             silent):
    log("\n  Searching for largest amplitudes...        ", calculation, 2, end="", silent=silent)
    t_ia, t_ijab = np.asarray(t_ia), np.asarray(t_ijab)
    t_ijab_flat = np.abs(t_ijab).ravel()
    t_ia_flat = np.abs(t_ia).ravel()
    idx_ijab = np.vstack(np.unravel_index(np.arange(t_ijab_flat.size), t_ijab.shape)).T
    idx_ia = np.vstack(np.unravel_index(np.arange(t_ia_flat.size), t_ia.shape)).T
    idx_ijab[:, 2:] += n_occ
    idx_ia[:, 1] += n_occ
    singles = np.full((idx_ia.shape[0], 4), -1, dtype=int)
    singles[:, 0] = idx_ia[:, 0]
    singles[:, 2] = idx_ia[:, 1]
    amplitudes = np.concatenate([t_ijab_flat, t_ia_flat])
    indices = np.vstack([idx_ijab, singles])
    order = np.argsort(-amplitudes)
    values = amplitudes[order]
    indices = indices[order]

    if calculation.reference == "UHF":
        labels = list(spin_orbital_labels) + ["ERR"] * n_occ
        labels = np.array(labels)
        mapped = labels[indices]
        mask = np.array([row[1][-1] == row[3][-1] and row[0][-1] == row[2][-1] for row in mapped])
        mapped, values = mapped[mask], values[mask]

        def fix_row(row):
            if row[1].endswith("a") or row[0].endswith("b"):
                row[0], row[1] = row[1], row[0]
                row[2], row[3] = row[3], row[2]
            return row

        mapped = np.array([fix_row(r) for r in mapped])
        _, unique_idx = np.unique(mapped, axis=0, return_index=True)
        mapped = mapped[np.sort(unique_idx)]
        values = values[np.sort(unique_idx)]
        indices = mapped
    else:
        indices = indices + 1

    log("[Done]", calculation, 2, silent=silent)
    log("\n  Largest amplitudes:\n", calculation, 2, silent=silent)

    n_print = min(calculation.print_n_amplitudes, len(indices))
    for i in range(n_print):
        a1, b1, a2, b2 = [f"{indices[i][j]:<3}" for j in (0, 1, 2, 3)]
        value = values[i]
        stars = "~~~~~~~~  "
        space, antispace = (" ", "") if calculation.reference == "RHF" else ("", " ")
        left = f"{a1}-> {space}{a2}{antispace}" if a1 != a2 else stars
        right = f"{b1}-> {space}{b2}{antispace}" if b1 != b2 else stars
        if value > 1e-6:
            log(f"    {left}   {right}  :    {value:6f}", calculation, 2, silent=silent)


# ---------------------------------------------------------------------------
# Iteration driver
# ---------------------------------------------------------------------------

_RESTRICTED_KERNELS = {
    "LCCD": restricted_LCCD, "CCD": restricted_CCD, "LCCSD": restricted_LCCSD,
    "CID": restricted_CID, "CISD": restricted_CISD, "QCISD": restricted_QCISD,
    "CCSD": restricted_CCSD,
}

_UNRESTRICTED_KERNELS = {
    "LCCD": unrestricted_LCCD, "CCD": unrestricted_CCD, "LCCSD": unrestricted_LCCSD,
    "CID": unrestricted_CID, "CISD": unrestricted_CISD, "QCISD": unrestricted_QCISD,
    "CCSD": unrestricted_CCSD,
}


def _initial_print(g, o, v, t_amplitudes, reference, method, calculation, silent):
    log_spacer(calculation, silent=silent, start="\n")
    log(f"              {method.name:>5} Energy and Density ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log(f"  Energy convergence tolerance:        {calculation.energy_convergence:.10f}", calculation, 1, silent=silent)
    log(f"  Amplitude convergence tolerance:     {calculation.amp_conv:.10f}", calculation, 1, silent=silent)

    t_ijab = t_amplitudes[1]
    if reference == "RHF":
        E_MP2 = float(jnp.einsum("ijab,ijab->", t_ijab,
                                 2 * g[o, o, v, v] - g[o, o, v, v].transpose(0, 1, 3, 2), optimize=True))
    else:
        E_MP2 = 0.25 * float(jnp.einsum("ijab,ijab->", t_ijab, g[o, o, v, v], optimize=True))

    log(f"\n  Guess t-amplitude MP2 energy:       {E_MP2:.10f}\n", calculation, 1, silent=silent)
    if calculation.correlated_damping_parameter != 0:
        log(f"  Using damping parameter of {calculation.correlated_damping_parameter:.2f} for convergence.", calculation, 1, silent=silent)
    if calculation.DIIS:
        log(f"  Using DIIS, storing {calculation.max_DIIS_matrices} matrices, for convergence.", calculation, 1, silent=silent)
    log(f"\n  Starting {method.name} iterations...\n", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log("  Step          Correlation E               DE", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)


def calculate_coupled_cluster_energy(g, o, v, t_amplitudes, e_denominators, F,
                                     method, calculation, silent, SCF_output,
                                     integrals):
    E_CC = 0.0
    iterate_singles = "CCD" not in method.name and "CID" not in method.name
    iterate_triples = "CCSDT" in method.name or "CISDT" in method.name
    iterate_quadruples = "CCSDTQ" in method.name

    original_name = method.name
    method.name = method.name.split("[T]")[0] if "[T]" in method.name else method.name
    method.name = method.name.split("[Q]")[0] if "[Q]" in method.name else method.name

    t_history: list = []
    error_history: list = []
    t_ia, t_ijab, t_ijkabc, t_ijklabcd = t_amplitudes

    _initial_print(g, o, v, t_amplitudes, calculation.reference, method, calculation, silent)

    restricted = calculation.reference == "RHF"
    w = 2 * g - g.swapaxes(0, 1) if restricted else None

    E_singles = E_connected = E_disconnected = 0.0

    for step in range(1, calculation.correlated_max_iter + 1):
        E_old = E_CC
        t_ia_old = t_ia if iterate_singles else jnp.zeros_like(e_denominators[0])
        t_ijab_old = t_ijab
        t_ijkabc_old = t_ijkabc if iterate_triples else None
        t_ijklabcd_old = t_ijklabcd if iterate_quadruples else None

        t_amplitudes = (t_ia, t_ijab, t_ijkabc, t_ijklabcd)
        t_amplitudes_old = (t_ia_old, t_ijab_old, t_ijkabc_old, t_ijklabcd_old)

        if restricted:
            name = method.name
            if name in _RESTRICTED_KERNELS:
                t_amplitudes = _RESTRICTED_KERNELS[name](g, o, v, t_amplitudes,
                                                         e_denominators, w, F)
            elif name == "CC2":
                t_amplitudes = restricted_CC2(o, v, t_amplitudes, e_denominators,
                                              SCF_output.molecular_orbitals, integrals)
            elif name == "CC3":
                t_amplitudes = restricted_CC3(o, v, t_amplitudes, e_denominators,
                                              SCF_output.molecular_orbitals, integrals)
            else:
                error(f"The {name} method is not yet available in TUNA-TPU!")
            E_CC, E_singles, E_connected, E_disconnected = restricted_cc_energy(
                o, v, w, t_amplitudes, method, F)
        else:
            name = method.name
            if name in _UNRESTRICTED_KERNELS:
                t_amplitudes = _UNRESTRICTED_KERNELS[name](g, o, v, t_amplitudes,
                                                           e_denominators, F)
            else:
                error(f"The {name} method is not yet available in TUNA-TPU!")
            E_CC, E_singles, E_connected, E_disconnected = unrestricted_cc_energy(
                o, v, g, t_amplitudes, method, F)

        t_ia, t_ijab, t_ijkabc, t_ijklabcd = t_amplitudes

        if E_CC > 1000 or any(not bool(jnp.all(jnp.isfinite(a)))
                              for a in t_amplitudes if a is not None):
            error(f'Non-finite encountered in {method.name} iteration. Try stronger '
                  'damping with the "CORRDAMP" keyword?.')

        delta_E = E_CC - E_old
        log(f"  {step:3.0f}           {E_CC:13.10f}         {delta_E:13.10f}",
            calculation, 1, silent=silent)

        if is_converged(delta_E, t_amplitudes, t_amplitudes_old, calculation):
            break
        if step >= calculation.correlated_max_iter:
            error(f"The {method.name} iterations failed to converge! Try increasing "
                  "the maximum iterations with CORRMAXITER?")

        t_amplitudes = apply_DIIS(t_amplitudes, t_amplitudes_old, t_history,
                                  error_history, step, calculation, silent)
        t_amplitudes = apply_damping(calculation.correlated_damping_parameter,
                                     t_amplitudes, t_amplitudes_old)
        t_ia, t_ijab, t_ijkabc, t_ijklabcd = t_amplitudes

    log_spacer(calculation, silent=silent)
    log(f"\n  Singles contribution:               {E_singles:13.10f}", calculation, 1, silent=silent)
    log(f"  Connected doubles contribution:     {E_connected:13.10f}", calculation, 1, silent=silent)
    log(f"  Disconnected doubles contribution:  {E_disconnected:13.10f}", calculation, 1, silent=silent)
    log(f"\n  {method.name} correlation energy:  {' ' * (10 - len(method.name))}    {E_CC:.10f}",
        calculation, 1, silent=silent)
    method.name = original_name
    return E_CC, t_amplitudes


def begin_coupled_cluster_calculation(method, molecule, SCF_output, integrals, X,
                                      calculation, silent):
    timer("Coupled cluster", 0)
    E_CC = E_perturbative = 0.0
    occupancies = natural_orbitals = None

    calculate_triples = method.name in ("CCSDT", "CCSD[T]", "CCSD(T)", "QCISD[T]",
                                        "QCISD(T)", "CCSDT[Q]", "CCSDT(Q)",
                                        "CCSDTQ", "CC3", "CISDT")
    calculate_quadruples = method.name in ("CCSDT[Q]", "CCSDT(Q)", "CCSDTQ")

    if calculation.reference == "RHF":
        n_occ = molecule.n_doubly_occ
        g, molecular_orbitals, epsilons, o, v = transforms.begin_spatial_orbital_calculation(
            molecule, integrals.ERI_AO, SCF_output, calculation, silent=silent)
        # All CC uses non-interleaved physicists' notation: (pr|qs) -> <pq|rs>
        g = g.swapaxes(1, 2)
        F = jnp.diag(jnp.asarray(epsilons))
        spin_labels_sorted, spin_orbital_labels_sorted = None, None
    else:
        n_occ = molecule.n_occ
        (g, molecular_orbitals, epsilons, _, o, v, spin_labels_sorted,
         spin_orbital_labels_sorted, _) = transforms.begin_spin_orbital_calculation(
            molecule, integrals.ERI_AO, SCF_output, calculation, silent=silent)
        H_core_sb = transforms.spin_block_matrix(jnp.asarray(integrals.H_core))
        H_core_SO = transforms.transform_matrix_ao_to_so(H_core_sb, molecular_orbitals)
        F = transforms.spin_orbital_fock(H_core_SO, g, slice(0, n_occ))

    log("\n Preparing arrays for coupled cluster...     ", calculation, 1, end="", silent=silent)
    epsilons = jnp.asarray(epsilons)
    e_ia = transforms.singles_epsilons(epsilons, o, v)
    e_ijab = transforms.doubles_epsilons(epsilons, epsilons, o, o, v, v)
    e_ijkabc = (transforms.triples_epsilons(epsilons, o, v)
                if calculate_triples else jnp.zeros_like(e_ijab))
    e_ijklabcd = (transforms.quadruples_epsilons(epsilons, o, v)
                  if calculate_quadruples else jnp.zeros_like(e_ijab))

    t_ia = e_ia * F[o, v]
    t_ijab = g[o, o, v, v] * e_ijab
    t_ijkabc = jnp.zeros_like(e_ijkabc)
    t_ijklabcd = jnp.zeros_like(e_ijklabcd)

    t_amplitudes = (t_ia, t_ijab, t_ijkabc, t_ijklabcd)
    e_denominators = (e_ia, e_ijab, e_ijkabc, e_ijklabcd)
    log("[Done]", calculation, 1, silent=silent)

    E_CC, t_amplitudes = calculate_coupled_cluster_energy(
        g, o, v, t_amplitudes, e_denominators, F, method, calculation, silent,
        SCF_output, integrals)

    t_ia, t_ijab, t_ijkabc, t_ijklabcd = t_amplitudes
    t_ia = jnp.zeros_like(e_ia) if t_ia is None else t_ia

    T1_diagnostic(molecule, t_ia, spin_labels_sorted, n_occ, molecule.n_alpha,
                  molecule.n_beta, calculation, silent)
    print_largest_amplitudes(t_ia, t_ijab, n_occ, calculation,
                             spin_orbital_labels_sorted, silent)

    density_matrices = linearised_density(t_ia, t_ijab, molecule.n_orbitals, n_occ,
                                          o, v, calculation, molecular_orbitals,
                                          silent=silent)
    if calculation.natural_orbitals:
        from .mp import print_natural_orbitals
        occupancies, natural_orbitals = print_natural_orbitals(
            density_matrices[0], X, SCF_output.S, calculation, silent)

    if "[T]" in method.name:
        if calculation.reference == "UHF":
            E_perturbative = unrestricted_CCSD_T(g, e_ijkabc, t_ia, t_ijab, o, v,
                                                 method, calculation, silent)
        else:
            E_perturbative = restricted_CCSD_T(g, e_ijkabc, t_ia, t_ijab, o, v,
                                               method, calculation, silent)
    elif "[Q]" in method.name:
        E_perturbative = restricted_CCSDT_Q(g, e_ijklabcd, t_ijab, t_ijkabc, o, v,
                                            calculation, silent)

    log_spacer(calculation, silent=silent)
    timer("Coupled cluster", 1)
    return E_CC, E_perturbative, density_matrices, occupancies, natural_orbitals


def restricted_CCSDT_Q(g, e_ijklabcd, t_ijab, t_ijkabc, o, v, calculation, silent):
    """Perturbative quadruples, MP5+MP6 form (tuna_cc.py:2848-2939)."""
    log_spacer(calculation, silent=silent, start="\n")
    log("                   CCSDT(Q) Energy ", calculation, 1, silent=silent)
    log_spacer(calculation, silent=silent)
    log("  Forming quadruples amplitudes...           ", calculation, 1, end="", silent=silent)

    g = g.swapaxes(1, 2)  # <pq|rs> -> (pq|rs)
    u_ijab = 2 * t_ijab - t_ijab.swapaxes(2, 3)
    K_ijab = g[o, v, o, v].transpose(0, 2, 1, 3)
    L_ijab = 2 * K_ijab - K_ijab.swapaxes(2, 3)

    def permute_four_columns(array):
        array = (array + array.swapaxes(0, 3).swapaxes(4, 7)
                 + array.swapaxes(1, 3).swapaxes(5, 7) + array.swapaxes(2, 3).swapaxes(6, 7))
        array = array + array.swapaxes(0, 2).swapaxes(4, 6) + array.swapaxes(1, 2).swapaxes(5, 6)
        return array + array.swapaxes(0, 1).swapaxes(4, 5)

    G = jnp.einsum("iabe,jklecd->ijklabcd", g[o, v, v, v], t_ijkabc, optimize=True)
    G += -jnp.einsum("iamj,mklbcd->ijklabcd", g[o, v, o, o], t_ijkabc, optimize=True)
    G += jnp.einsum("minj,mkac,nlbd->ijklabcd", g[o, o, o, o], t_ijab, t_ijab, optimize=True)
    G += -2 * jnp.einsum("iame,kjeb,mlcd->ijklabcd", g[o, v, o, v], t_ijab, t_ijab, optimize=True)
    G += jnp.einsum("cfae,ijeb,klfd->ijklabcd", g[v, v, v, v], t_ijab, t_ijab, optimize=True)
    G += -2 * jnp.einsum("bemi,kjce,mlad->ijklabcd", g[v, v, o, o], t_ijab, t_ijab, optimize=True)
    G = 0.5 * permute_four_columns(G)
    t_ijklabcd = G * e_ijklabcd
    log("[Done]", calculation, 1, silent=silent)

    log("\n  Calculating MP5 contribution to energy...  ", calculation, 1, end="", silent=silent)
    E_MP5 = float(jnp.einsum("ijklcdab,klcd,ijab->", t_ijklabcd, u_ijab, K_ijab, optimize=True))
    E_MP5 += -2 * float(jnp.einsum("ijklbdac,kldc,ijba->", t_ijklabcd, u_ijab, L_ijab, optimize=True))
    E_MP5 += float(jnp.einsum("ijklabcd,klcd,ijab->", t_ijklabcd, u_ijab, L_ijab, optimize=True))
    log("[Done]", calculation, 1, silent=silent)

    log("  Calculating MP6 contribution to energy...  ", calculation, 1, end="", silent=silent)
    t_bar = -2 * t_ijklabcd - t_ijklabcd.swapaxes(4, 6).swapaxes(5, 7) + t_ijklabcd.swapaxes(4, 5)
    t_tilde = (2 * t_ijklabcd.transpose(0, 1, 2, 3, 7, 5, 4, 6)
               - t_ijklabcd.transpose(0, 1, 2, 3, 5, 7, 4, 6))
    t_tilde = t_tilde + t_tilde.swapaxes(2, 3).swapaxes(6, 7)

    term = jnp.einsum("mjicba,ldkm->ijklabcd", t_ijkabc, g[o, v, o, o], optimize=True)
    term2 = jnp.einsum("kjieba,ldce->ijklabcd", t_ijkabc, g[o, v, v, v], optimize=True)
    alpha = 2 * term - term.swapaxes(6, 7) - 2 * term2 + term2.swapaxes(2, 3)
    term = jnp.einsum("mjicba,kdlm->ijklabcd", t_ijkabc, g[o, v, o, o], optimize=True)
    term2 = jnp.einsum("ljieba,kdce->ijklabcd", t_ijkabc, g[o, v, v, v], optimize=True)
    beta = 2 * term - term.swapaxes(6, 7) - 2 * term2 + term2.swapaxes(2, 3)

    E_MP6 = 2 * float(jnp.einsum("ijklabcd,ijklabcd->", alpha, t_bar, optimize=True))
    E_MP6 += 2 * float(jnp.einsum("ijklabcd,ijklabcd->", beta, t_tilde, optimize=True))
    E_Q = E_MP5 + E_MP6
    log("[Done]", calculation, 1, silent=silent)

    log(f"\n  Contribution from MP5:              {E_MP5:13.10f}", calculation, 2, silent=silent)
    log(f"  Contribution from MP6:              {E_MP6:13.10f}", calculation, 2, silent=silent)
    log(f"\n  CCSDT(Q) correlation energy:        {E_Q:13.10f}", calculation, 1, silent=silent)
    return E_Q
