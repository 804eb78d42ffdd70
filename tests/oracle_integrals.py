"""Independent slow NumPy/SciPy McMurchie-Davidson oracle for integral tests.

Deliberately written with the *general 3-D* Hermite Coulomb recursion (full
R_tuv tables, no z-axis specialisation) so it exercises a different algorithm
path from tuna_tpu.ops.integrals, giving an independent correctness check.
"""

import numpy as np
from scipy.special import hyp1f1


def boys(m, T):
    return hyp1f1(m + 0.5, m + 1.5, -T) / (2.0 * m + 1.0)


def E(i, j, t, Qx, a, b):
    """Hermite expansion coefficient (recursive, general)."""
    p = a + b
    q = a * b / p
    if t < 0 or t > i + j:
        return 0.0
    if i == j == t == 0:
        return np.exp(-q * Qx * Qx)
    if j == 0:
        return (E(i - 1, j, t - 1, Qx, a, b) / (2 * p)
                - (q * Qx / a) * E(i - 1, j, t, Qx, a, b)
                + (t + 1) * E(i - 1, j, t + 1, Qx, a, b))
    return (E(i, j - 1, t - 1, Qx, a, b) / (2 * p)
            + (q * Qx / b) * E(i, j - 1, t, Qx, a, b)
            + (t + 1) * E(i, j - 1, t + 1, Qx, a, b))


def R(t, u, v, n, p, PCx, PCy, PCz, RPC):
    """General Hermite Coulomb integral (recursive)."""
    T = p * RPC * RPC
    if t == u == v == 0:
        return (-2 * p) ** n * boys(n, T)
    if t < 0 or u < 0 or v < 0:
        return 0.0
    if t > 0:
        return (t - 1) * R(t - 2, u, v, n + 1, p, PCx, PCy, PCz, RPC) + PCx * R(t - 1, u, v, n + 1, p, PCx, PCy, PCz, RPC)
    if u > 0:
        return (u - 1) * R(t, u - 2, v, n + 1, p, PCx, PCy, PCz, RPC) + PCy * R(t, u - 1, v, n + 1, p, PCx, PCy, PCz, RPC)
    return (v - 1) * R(t, u, v - 2, n + 1, p, PCx, PCy, PCz, RPC) + PCz * R(t, u, v - 1, n + 1, p, PCx, PCy, PCz, RPC)


def overlap_prim(a, lmn1, A, b, lmn2, B):
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    p = a + b
    return (E(l1, l2, 0, A[0] - B[0], a, b)
            * E(m1, m2, 0, A[1] - B[1], a, b)
            * E(n1, n2, 0, A[2] - B[2], a, b)
            * (np.pi / p) ** 1.5)


def kinetic_prim(a, lmn1, A, b, lmn2, B):
    l2, m2, n2 = lmn2
    term0 = b * (2 * (l2 + m2 + n2) + 3) * overlap_prim(a, lmn1, A, b, lmn2, B)
    term1 = -2 * b**2 * (overlap_prim(a, lmn1, A, b, (l2 + 2, m2, n2), B)
                         + overlap_prim(a, lmn1, A, b, (l2, m2 + 2, n2), B)
                         + overlap_prim(a, lmn1, A, b, (l2, m2, n2 + 2), B))
    term2 = -0.5 * (l2 * (l2 - 1) * overlap_prim(a, lmn1, A, b, (l2 - 2, m2, n2), B)
                    + m2 * (m2 - 1) * overlap_prim(a, lmn1, A, b, (l2, m2 - 2, n2), B)
                    + n2 * (n2 - 1) * overlap_prim(a, lmn1, A, b, (l2, m2, n2 - 2), B))
    return term0 + term1 + term2


def nuclear_prim(a, lmn1, A, b, lmn2, B, C):
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    p = a + b
    P = (a * np.asarray(A) + b * np.asarray(B)) / p
    RPC = np.linalg.norm(P - C)
    val = 0.0
    for t in range(l1 + l2 + 1):
        for u in range(m1 + m2 + 1):
            for v in range(n1 + n2 + 1):
                val += (E(l1, l2, t, A[0] - B[0], a, b)
                        * E(m1, m2, u, A[1] - B[1], a, b)
                        * E(n1, n2, v, A[2] - B[2], a, b)
                        * R(t, u, v, 0, p, P[0] - C[0], P[1] - C[1], P[2] - C[2], RPC))
    return val * 2 * np.pi / p


def eri_prim(a, lmn1, A, b, lmn2, B, c, lmn3, C, d, lmn4, D):
    l1, m1, n1 = lmn1
    l2, m2, n2 = lmn2
    l3, m3, n3 = lmn3
    l4, m4, n4 = lmn4
    p = a + b
    q = c + d
    alpha = p * q / (p + q)
    P = (a * np.asarray(A) + b * np.asarray(B)) / p
    Q = (c * np.asarray(C) + d * np.asarray(D)) / q
    RPQ = np.linalg.norm(P - Q)
    val = 0.0
    for t in range(l1 + l2 + 1):
        for u in range(m1 + m2 + 1):
            for v in range(n1 + n2 + 1):
                for tau in range(l3 + l4 + 1):
                    for nu in range(m3 + m4 + 1):
                        for phi in range(n3 + n4 + 1):
                            val += (E(l1, l2, t, A[0] - B[0], a, b)
                                    * E(m1, m2, u, A[1] - B[1], a, b)
                                    * E(n1, n2, v, A[2] - B[2], a, b)
                                    * E(l3, l4, tau, C[0] - D[0], c, d)
                                    * E(m3, m4, nu, C[1] - D[1], c, d)
                                    * E(n3, n4, phi, C[2] - D[2], c, d)
                                    * (-1) ** (tau + nu + phi)
                                    * R(t + tau, u + nu, v + phi, 0, alpha,
                                        P[0] - Q[0], P[1] - Q[1], P[2] - Q[2], RPQ))
    return val * 2 * np.pi**2.5 / (p * q * np.sqrt(p + q))


def contracted(prim_fn, bf1, bf2, *extra):
    val = 0.0
    for a, ca, na in zip(bf1.exps, bf1.coefs, bf1.norms):
        for b, cb, nb in zip(bf2.exps, bf2.coefs, bf2.norms):
            val += ca * na * cb * nb * prim_fn(a, bf1.lmn, bf1.origin, b, bf2.lmn, bf2.origin, *extra)
    return val


def contracted_eri(bf1, bf2, bf3, bf4):
    val = 0.0
    for a, c1, n1 in zip(bf1.exps, bf1.coefs, bf1.norms):
        for b, c2, n2 in zip(bf2.exps, bf2.coefs, bf2.norms):
            for c, c3, n3 in zip(bf3.exps, bf3.coefs, bf3.norms):
                for d, c4, n4 in zip(bf4.exps, bf4.coefs, bf4.norms):
                    val += (c1 * n1 * c2 * n2 * c3 * n3 * c4 * n4
                            * eri_prim(a, bf1.lmn, bf1.origin, b, bf2.lmn, bf2.origin,
                                       c, bf3.lmn, bf3.origin, d, bf4.lmn, bf4.origin))
    return val


def one_electron_matrices(basis_functions, atoms, dipole_origin):
    n = len(basis_functions)
    S = np.zeros((n, n))
    T = np.zeros((n, n))
    V = np.zeros((n, n))
    D = np.zeros((3, n, n))
    Q = np.zeros((3, n, n))
    for i, bi in enumerate(basis_functions):
        for j, bj in enumerate(basis_functions):
            S[i, j] = contracted(overlap_prim, bi, bj)
            T[i, j] = contracted(kinetic_prim, bi, bj)
            for atom in atoms:
                V[i, j] -= atom.charge * contracted(nuclear_prim, bi, bj, atom.origin)
            # dipole and quadrupole via raised angular momentum on centre 2
            for axis in range(3):
                def dip(a, l1, A, b, l2, B, ax=axis):
                    l2p = list(l2)
                    l2p[ax] += 1
                    XBC = B[ax] - dipole_origin[ax]
                    return overlap_prim(a, l1, A, b, tuple(l2p), B) + XBC * overlap_prim(a, l1, A, b, tuple(l2), B)

                def quad(a, l1, A, b, l2, B, ax=axis):
                    l2p = list(l2)
                    l2p[ax] += 1
                    l2pp = list(l2)
                    l2pp[ax] += 2
                    XBC = B[ax] - dipole_origin[ax]
                    return (overlap_prim(a, l1, A, b, tuple(l2pp), B)
                            + 2 * XBC * overlap_prim(a, l1, A, b, tuple(l2p), B)
                            + XBC * XBC * overlap_prim(a, l1, A, b, tuple(l2), B))

                D[axis, i, j] = contracted(dip, bi, bj)
                Q[axis, i, j] = contracted(quad, bi, bj)
    return S, T, V, D, Q


def eri_tensor(basis_functions):
    n = len(basis_functions)
    eri = np.zeros((n, n, n, n))
    for i in range(n):
        for j in range(n):
            for k in range(n):
                for l in range(n):
                    eri[i, j, k, l] = contracted_eri(
                        basis_functions[i], basis_functions[j],
                        basis_functions[k], basis_functions[l])
    return eri
