"""post.rpa property tests with no reference data: the Hermitian-product
Casida fold must agree with a dense non-Hermitian eigensolve of the full
[[A,B],[-B,-A]] block, and the stability spectrum identity must hold."""

import numpy as np
import jax.numpy as jnp

from tuna_tpu.post import rpa


def _random_stable_blocks(n=24, seed=0):
    rng = np.random.RandomState(seed)
    B = rng.randn(n, n) * 0.05
    B = (B + B.T) / 2
    A = rng.randn(n, n) * 0.05
    A = (A + A.T) / 2 + np.diag(np.linspace(1.0, 3.0, n))  # diagonally dominant
    return jnp.asarray(A), jnp.asarray(B)


def test_hermitian_fold_matches_dense_eig():
    A, B = _random_stable_blocks()
    w, vec, amb_min, w2_min = rpa.rpa_excitations(A + B, A - B)
    assert float(amb_min) > 0 and float(w2_min) > 0

    H = np.block([[np.asarray(A), np.asarray(B)],
                  [-np.asarray(B), -np.asarray(A)]])
    dense = np.linalg.eigvals(H)
    dense = np.sort(dense[dense.real > 0].real)
    np.testing.assert_allclose(np.asarray(w), dense, atol=1e-10)

    # vectors satisfy the Casida equations: (A X + B Y) = w X, (B X + A Y) = -w Y
    n = A.shape[0]
    X, Y = np.asarray(vec)[:n], np.asarray(vec)[n:]
    w_np = np.asarray(w)
    res1 = np.asarray(A) @ X + np.asarray(B) @ Y - X * w_np[None, :]
    res2 = np.asarray(B) @ X + np.asarray(A) @ Y + Y * w_np[None, :]
    assert np.max(np.abs(res1)) < 1e-9
    assert np.max(np.abs(res2)) < 1e-9
    # X^2 - Y^2 metric
    metric = np.einsum("in,in->n", X, X) - np.einsum("in,in->n", Y, Y)
    np.testing.assert_allclose(metric, 1.0, atol=1e-10)


def test_stability_spectrum_identity():
    A, B = _random_stable_blocks(seed=3)
    apb, amb = A + B, A - B
    lowest = float(rpa.orbital_hessian_lowest(apb, amb))
    H = np.block([[np.asarray(A), np.asarray(B)],
                  [np.asarray(B), np.asarray(A)]])
    assert abs(lowest - np.linalg.eigvalsh(H)[0]) < 1e-10
