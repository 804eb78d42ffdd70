"""Exchange-correlation functionals as pure energy densities with autodiff
derivatives.

The reference hand-codes value + all partial derivatives for every functional
(/root/reference/TUNA/tuna_xc.py, 6762 lines).  Here each functional is a
single energy-density expression f(rho, sigma, tau) = rho * eps, and the
derivatives df/drho, df/dsigma, df/dtau needed for V_XC come from jax.grad --
eliminating the largest hand-derivation error surface while producing the
same potentials.  Parameter values follow the reference / LibXC conventions
so energies agree (e.g. PBE beta = 0.066725 to match ORCA).

Restricted functionals take the total closed-shell density; unrestricted
exchange uses the exact spin-scaling relation (handled by the caller);
unrestricted correlation functionals are spin-resolved.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

DENSITY_FLOOR = 1e-23
SIGMA_FLOOR = DENSITY_FLOOR**2
EXPONENT_CEILING = 600


@dataclass(frozen=True)
class XCParams:
    x_alpha: float = 2 / 3
    method_name: str = ""
    x_name: str | None = None


def clean(values, floor=DENSITY_FLOOR):
    """Floor tiny/negative grid values that break functional evaluation."""
    return jnp.maximum(values, floor)


# =========================================================================
# Derivative machinery
# =========================================================================

def restricted_derivatives(functional, density, sigma, tau, params: XCParams):
    """(df_dn, df_ds, df_dt, eps) for f(rho, sigma, tau) = rho * eps."""
    needs_sigma = getattr(functional, "needs_sigma", False)
    needs_tau = getattr(functional, "needs_tau", False)
    s = sigma if needs_sigma else None
    t = tau if needs_tau else None

    def f_sum(n, sg, tu):
        return jnp.sum(functional(n, sg, tu, params))

    args = [density, s, t]
    active = [0] + ([1] if needs_sigma else []) + ([2] if needs_tau else [])
    grads = jax.grad(f_sum, argnums=tuple(active))(*args)
    grad_map = dict(zip(active, grads))

    eps = functional(density, s, t, params) / density
    return (grad_map[0],
            grad_map.get(1) if needs_sigma else None,
            grad_map.get(2) if needs_tau else None,
            eps)


def unrestricted_derivatives(functional, dens_a, dens_b, sigma_aa, sigma_bb,
                             sigma_ab, tau_a, tau_b, params: XCParams):
    """Spin-resolved derivatives for f(na, nb, saa, sbb, sab, ta, tb)."""
    needs_sigma = getattr(functional, "needs_sigma", False)
    needs_tau = getattr(functional, "needs_tau", False)
    saa = sigma_aa if needs_sigma else None
    sbb = sigma_bb if needs_sigma else None
    sab = sigma_ab if needs_sigma else None
    ta = tau_a if needs_tau else None
    tb = tau_b if needs_tau else None

    def f_sum(na, nb, xaa, xbb, xab, ya, yb):
        return jnp.sum(functional(na, nb, xaa, xbb, xab, ya, yb, params))

    active = [0, 1] + ([2, 3, 4] if needs_sigma else []) + ([5, 6] if needs_tau else [])
    grads = jax.grad(f_sum, argnums=tuple(active))(dens_a, dens_b, saa, sbb, sab, ta, tb)
    grad_map = dict(zip(active, grads))

    eps = functional(dens_a, dens_b, saa, sbb, sab, ta, tb, params) / (dens_a + dens_b)
    return (grad_map[0], grad_map[1],
            grad_map.get(2), grad_map.get(3), grad_map.get(4),
            grad_map.get(5), grad_map.get(6), eps)


def _mark(fn, needs_sigma=False, needs_tau=False):
    fn.needs_sigma = needs_sigma
    fn.needs_tau = needs_tau
    return fn


# =========================================================================
# Exchange energy densities (closed-shell total-density form, f = rho * eps)
# =========================================================================

def _slater_eps(density, alpha):
    return -(9 / 8) * alpha * jnp.cbrt(3 / jnp.pi) * jnp.cbrt(density)


def f_slater_x(density, sigma, tau, params):
    return density * _slater_eps(density, params.x_alpha)


def _b88_f_spin(rho_s, sigma_s, beta=0.0042):
    """Per-spin B88 f = rho_s * eps_s (Becke 1988)."""
    cbrt_rho = jnp.cbrt(rho_s)
    x = jnp.sqrt(sigma_s) / cbrt_rho**4
    lda = -(3 / 2) * jnp.cbrt(3 / (4 * jnp.pi)) * rho_s * cbrt_rho
    gga = -beta * rho_s * cbrt_rho * x**2 / (1 + 6 * beta * x * jnp.arcsinh(x))
    return lda + gga


def f_b88_x(density, sigma, tau, params):
    return 2 * _b88_f_spin(density / 2, sigma / 4)


def f_b3_x(density, sigma, tau, params):
    """B3LYP exchange mix: 0.9 B88 + 0.1 Slater (combined with DFX = 0.8 and
    HFX = 0.2 this gives the standard 0.72/0.08/0.20 split)."""
    return 0.9 * f_b88_x(density, sigma, tau, params) + 0.1 * f_slater_x(density, sigma, tau, params)


def _pbe_x_family(density, sigma, params, kappa, form="pbe"):
    mu = 0.21952
    s_squared = sigma / (jnp.cbrt(576 * jnp.pi**4) * jnp.cbrt(density)**8)
    if form == "rpbe":
        F_X = 1 + kappa * (1 - jnp.exp(-mu * s_squared / kappa))
    else:
        F_X = 1 + kappa - kappa / (1 + mu / kappa * s_squared)
    return density * _slater_eps(density, params.x_alpha) * F_X


def f_pbe_x(density, sigma, tau, params):
    kappa = 1.245 if params.x_name == "REVPBE" else 0.804
    return _pbe_x_family(density, sigma, params, kappa)


def f_rpbe_x(density, sigma, tau, params):
    return _pbe_x_family(density, sigma, params, 0.804, form="rpbe")


def _pw91_f_spin(rho_s, sigma_s):
    """PW91 exchange per spin (Perdew-Wang 1991 enhancement factor)."""
    k_F = jnp.cbrt(6 * jnp.pi**2 * rho_s)
    s = jnp.sqrt(sigma_s) / (2 * k_F * rho_s)
    s2 = s * s
    a, b, c, d = 0.19645, 7.7956, 0.2743, 0.1508
    F = ((1 + a * s * jnp.arcsinh(b * s) + (c - d * jnp.exp(-100.0 * s2)) * s2)
         / (1 + a * s * jnp.arcsinh(b * s) + 0.004 * s2 * s2))
    lda = -(3 / 2) * jnp.cbrt(3 / (4 * jnp.pi)) * rho_s * jnp.cbrt(rho_s)
    return lda * F


def f_pw91_x(density, sigma, tau, params):
    return 2 * _pw91_f_spin(density / 2, sigma / 4)


# =========================================================================
# LDA correlation: VWN and PW92 parameterisations
# =========================================================================

def _seitz_radius(density):
    return jnp.cbrt(3 / (4 * jnp.pi * density))


def _vwn_eps(density, x_0, b, c, A):
    Q = jnp.sqrt(4 * c - b**2)
    X_0 = x_0**2 + b * x_0 + c
    c_1 = -b * x_0 / X_0
    c_2 = 2 * b * (c - x_0**2) / (Q * X_0)
    r_s = _seitz_radius(density)
    x = jnp.sqrt(r_s)
    X = r_s + b * x + c
    return A * (jnp.log(r_s / X) + c_1 * jnp.log((x - x_0)**2 / X)
                + c_2 * jnp.arctan(Q / (2 * x + b)))


_VWN3_PARA = (-0.409286, 13.0720, 42.7198, 0.0310907)
_VWN3_FERRO = (-0.743294, 20.1231, 101.578, 0.01554535)
_VWN5_PARA = (-0.10498, 3.72744, 12.9352, 0.0310907)
_VWN5_FERRO = (-0.32500, 7.06042, 18.0578, 0.01554535)
_VWN5_STIFF = (-0.0047584, 1.13107, 13.0045, 1 / (6 * jnp.pi**2))


def _pw92_eps(density, A, alpha_1, beta_1, beta_2, beta_3, beta_4, P=1):
    r_s = _seitz_radius(density)
    Q_0 = -2 * A * (1 + alpha_1 * r_s)
    Q_1 = 2 * A * (beta_1 * jnp.sqrt(r_s) + beta_2 * r_s
                   + beta_3 * r_s**1.5 + beta_4 * r_s**(P + 1))
    return Q_0 * jnp.log1p(1 / Q_1)


_PW92_PARA = (0.0310907, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
_PW92_FERRO = (0.01554535, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
_PW92_STIFF = (0.0168869, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)


def _zeta_f(zeta):
    return (jnp.cbrt(1 + zeta)**4 + jnp.cbrt(1 - zeta)**4 - 2) / (2 * jnp.cbrt(2)**4 - 4)


def f_vwn3_c(density, sigma, tau, params):
    return density * _vwn_eps(density, *_VWN3_PARA)


def f_vwn5_c(density, sigma, tau, params):
    return density * _vwn_eps(density, *_VWN5_PARA)


def f_pw_c(density, sigma, tau, params):
    return density * _pw92_eps(density, *_PW92_PARA)


def f_u_vwn3_c(na, nb, saa, sbb, sab, ta, tb, params):
    density = na + nb
    zeta = (na - nb) / density
    e0 = _vwn_eps(density, *_VWN3_PARA)
    e1 = _vwn_eps(density, *_VWN3_FERRO)
    return density * (e0 + (e1 - e0) * _zeta_f(zeta))


def f_u_vwn5_c(na, nb, saa, sbb, sab, ta, tb, params):
    density = na + nb
    zeta = (na - nb) / density
    e0 = _vwn_eps(density, *_VWN5_PARA)
    e1 = _vwn_eps(density, *_VWN5_FERRO)
    minus_alpha = _vwn_eps(density, *_VWN5_STIFF)
    alpha_c = -minus_alpha
    fz = _zeta_f(zeta)
    fpp0 = 8 / (9 * (jnp.cbrt(2)**4 - 2))
    z4 = zeta**4
    eps = e0 + alpha_c * fz / fpp0 * (1 - z4) + (e1 - e0) * fz * z4
    return density * eps


def _pw92_eps_spin(density, zeta):
    e0 = _pw92_eps(density, *_PW92_PARA)
    e1 = _pw92_eps(density, *_PW92_FERRO)
    alpha_c = -_pw92_eps(density, *_PW92_STIFF)
    fz = _zeta_f(zeta)
    fpp0 = 8 / (9 * (jnp.cbrt(2)**4 - 2))
    z4 = zeta**4
    return e0 + alpha_c * fz / fpp0 * (1 - z4) + (e1 - e0) * fz * z4


def f_u_pw_c(na, nb, saa, sbb, sab, ta, tb, params):
    density = na + nb
    zeta = (na - nb) / density
    return density * _pw92_eps_spin(density, zeta)


# =========================================================================
# GGA correlation: LYP, PBE, P86
# =========================================================================

def _lyp_f(na, nb, saa, sbb, sab):
    """Spin-resolved LYP (Miehlich-Savin-Stoll-Preuss form)."""
    a, b, c, d = 0.04918, 0.132, 0.2533, 0.349
    density = na + nb
    inv_cbrt = 1 / jnp.cbrt(density)
    X = 1 + d * inv_cbrt
    C = jnp.cbrt(2.0)**11 * 3 / 10 * jnp.cbrt(3 * jnp.pi**2)**2
    omega = inv_cbrt**11 * jnp.exp(-c * inv_cbrt) / X
    delta = inv_cbrt * (c + d / X)
    minus_abw = -a * b * omega
    product = na * nb
    power_sum = jnp.cbrt(na)**8 + jnp.cbrt(nb)**8

    g_aa = minus_abw * ((1 / 9) * product * (1 - 3 * delta - (delta - 11) * na / density) - nb * nb)
    g_bb = minus_abw * ((1 / 9) * product * (1 - 3 * delta - (delta - 11) * nb / density) - na * na)
    g_ab = minus_abw * ((1 / 9) * product * (47 - 7 * delta) - (4 / 3) * density * density)

    return (product * (C * minus_abw * power_sum - 4 * a / (X * density))
            + g_aa * saa + g_bb * sbb + g_ab * sab)


def f_lyp_c(density, sigma, tau, params):
    half, quarter = density / 2, sigma / 4
    return _lyp_f(half, half, quarter, quarter, quarter)


def f_u_lyp_c(na, nb, saa, sbb, sab, ta, tb, params):
    return _lyp_f(na, nb, saa, sbb, sab)


def _pbe_c_f(density, zeta, sigma):
    """PBE correlation on the PW92 LDA base (beta matched to ORCA)."""
    gamma = (1 - jnp.log(2.0)) / jnp.pi**2
    beta = 0.066725
    eps_lda = _pw92_eps_spin(density, zeta)
    phi = (jnp.cbrt(1 + zeta)**2 + jnp.cbrt(1 - zeta)**2) / 2
    k_F = jnp.cbrt(3 * jnp.pi**2 * density)
    t_squared = sigma * jnp.pi / (16 * phi**2 * k_F * density**2)
    A = beta / (gamma * (jnp.exp(-eps_lda / (gamma * phi**3)) - 1))
    k = 1 + A * t_squared
    D = k + A * A * t_squared * t_squared
    H = gamma * phi**3 * jnp.log1p((beta / gamma) * t_squared * k / D)
    return density * (eps_lda + H)


def f_pbe_c(density, sigma, tau, params):
    return _pbe_c_f(density, jnp.zeros_like(density), sigma)


def f_u_pbe_c(na, nb, saa, sbb, sab, ta, tb, params):
    density = na + nb
    zeta = (na - nb) / density
    sigma = saa + 2 * sab + sbb
    return _pbe_c_f(density, zeta, sigma)


def _p86_f(na, nb, saa, sbb, sab):
    """Perdew 1986 correlation on the PZ81 local base."""
    density = na + nb
    zeta = (na - nb) / density
    sigma = saa + 2 * sab + sbb
    r_s = _seitz_radius(density)

    # PZ81 local correlation
    def eps_pz(r_s, gamma_, beta1, beta2, A_, B_, C_, D_):
        high = gamma_ / (1 + beta1 * jnp.sqrt(r_s) + beta2 * r_s)
        low = A_ * jnp.log(r_s) + B_ + C_ * r_s * jnp.log(r_s) + D_ * r_s
        return jnp.where(r_s >= 1, high, low)

    eps0 = eps_pz(r_s, -0.1423, 1.0529, 0.3334, 0.0311, -0.048, 0.0020, -0.0116)
    eps1 = eps_pz(r_s, -0.0843, 1.3981, 0.2611, 0.01555, -0.0269, 0.0007, -0.0048)
    fz = _zeta_f(zeta)
    eps_local = eps0 + (eps1 - eps0) * fz

    # Gradient correction (Perdew 1986)
    C_inf = 0.001667 + 0.002568
    Cn = 0.001667 + ((0.002568 + 0.023266 * r_s + 7.389e-6 * r_s**2)
                     / (1 + 8.723 * r_s + 0.472 * r_s**2 + 0.07389 * r_s**3))
    grad = jnp.sqrt(sigma)
    d_spin = jnp.sqrt(jnp.cbrt((1 + zeta) / 2)**5 + jnp.cbrt((1 - zeta) / 2)**5) * jnp.cbrt(2.0)
    Phi = 1.745 * 0.11 * C_inf / Cn * grad / density**(7 / 6)
    correction = jnp.exp(-Phi) * Cn * sigma / (d_spin * jnp.cbrt(density)**4)
    return density * eps_local + correction


def f_p86_c(density, sigma, tau, params):
    half, quarter = density / 2, sigma / 4
    return _p86_f(half, half, quarter, quarter, quarter)


def f_u_p86_c(na, nb, saa, sbb, sab, ta, tb, params):
    return _p86_f(na, nb, saa, sbb, sab)


def f_3p_c(density, sigma, tau, params):
    """B3LYP-style 3-parameter correlation: 0.81 GGA + 0.19 LDA
    (tuna_xc.py:5843-5883; the "/G" spelling selects VWN-III)."""
    method = params.method_name
    lda = f_vwn3_c if "G" in method else f_vwn5_c
    gga = f_p86_c if "P86" in method else f_lyp_c
    return 0.81 * gga(density, sigma, tau, params) + 0.19 * lda(density, None, None, params)


def f_u_3p_c(na, nb, saa, sbb, sab, ta, tb, params):
    method = params.method_name
    lda = f_u_vwn3_c if "G" in method else f_u_vwn5_c
    gga = f_u_p86_c if "P86" in method else f_u_lyp_c
    return (0.81 * gga(na, nb, saa, sbb, sab, ta, tb, params)
            + 0.19 * lda(na, nb, None, None, None, None, None, params))


# =========================================================================
# Registries
# =========================================================================

EXCHANGE_FUNCTIONALS = {
    "S": _mark(f_slater_x),
    "B": _mark(f_b88_x, needs_sigma=True),
    "B3": _mark(f_b3_x, needs_sigma=True),
    "PBE": _mark(f_pbe_x, needs_sigma=True),
    "REVPBE": _mark(f_pbe_x, needs_sigma=True),
    "RPBE": _mark(f_rpbe_x, needs_sigma=True),
    "PW": _mark(f_pw91_x, needs_sigma=True),
}

CORRELATION_FUNCTIONALS = {
    "VWN3": _mark(f_vwn3_c),
    "VWN5": _mark(f_vwn5_c),
    "PW": _mark(f_pw_c),
    "LYP": _mark(f_lyp_c, needs_sigma=True),
    "3P": _mark(f_3p_c, needs_sigma=True),
    "PBE": _mark(f_pbe_c, needs_sigma=True),
    "P86": _mark(f_p86_c, needs_sigma=True),
    "UP86": _mark(f_p86_c, needs_sigma=True),
}

UNRESTRICTED_CORRELATION_FUNCTIONALS = {
    "VWN3": _mark(f_u_vwn3_c),
    "VWN5": _mark(f_u_vwn5_c),
    "PW": _mark(f_u_pw_c),
    "LYP": _mark(f_u_lyp_c, needs_sigma=True),
    "3P": _mark(f_u_3p_c, needs_sigma=True),
    "PBE": _mark(f_u_pbe_c, needs_sigma=True),
    "P86": _mark(f_u_p86_c, needs_sigma=True),
    "UP86": _mark(f_u_p86_c, needs_sigma=True),
}
