"""Ozaki slice contractions must reproduce f64 einsums to ~1e-12 relative.
These are the contractions the Newton finisher runs through ops.ozaki on
TPU; on CPU the bf16 slice dots are emulated, so the same numerical claims
hold everywhere."""

import jax.numpy as jnp
import numpy as np
import pytest

from tuna_tpu.ops import ozaki

RNG = np.random.RandomState(7)


def _check(spec, shapes, scale=1.0, tol=1e-11):
    ops = [jnp.asarray(RNG.randn(*s) * scale) for s in shapes]
    got = np.asarray(ozaki.einsum(spec, *ops))
    want = np.asarray(jnp.einsum(spec, *ops, optimize=True))
    denom = np.max(np.abs(want)) + 1e-300
    err = np.max(np.abs(got - want)) / denom
    assert err < tol, f"{spec}: relative error {err:.2e}"


@pytest.mark.parametrize("spec,shapes", [
    # shapes from the CCSD residual at o=7, v=19
    ("ijkl,klab->ijab", [(7, 7, 7, 7), (7, 7, 19, 19)]),
    ("abcd,ijcd->ijab", [(19, 19, 19, 19), (7, 7, 19, 19)]),
    ("icak,kjcb->ijab", [(7, 19, 19, 7), (7, 7, 19, 19)]),
    ("kacd,ijcd->kaij", [(7, 19, 19, 19), (7, 7, 19, 19)]),
    ("klcd,ilcd->ik",   [(7, 7, 19, 19), (7, 7, 19, 19)]),
    ("icab,jc->ijab",   [(7, 19, 19, 19), (7, 19)]),
    ("ca,ijcb->ijab",   [(19, 19), (7, 7, 19, 19)]),
    ("kc,kica->ia",     [(7, 19), (7, 7, 19, 19)]),
])
def test_matches_f64_einsum(spec, shapes):
    _check(spec, shapes)


@pytest.mark.parametrize("spec,shapes", [
    # leading group axis -> one batched dot_general per slice pair
    ("gik,gkj->gij",   [(4, 13, 17), (4, 17, 11)]),
    ("gxkc,gkcy->gxy", [(3, 9, 7, 19), (3, 7, 19, 8)]),
    # batch label positioned mid-subscript
    ("igk,kgj->ijg",   [(13, 4, 17), (17, 4, 11)]),
])
def test_batched_matches_f64_einsum(spec, shapes):
    _check(spec, shapes)


def test_under_vmap_matches_f64():
    """ozaki.einsum inside a vmapped function (the batched CC scans route
    their per-point f64 contractions through it on accelerator meshes):
    vmap traces per-element shapes, so the slice planning must behave as in
    the unbatched case and the results must match a vmapped f64 einsum."""
    import jax

    A = jnp.asarray(RNG.randn(5, 7, 19))
    B = jnp.asarray(RNG.randn(5, 19, 11))

    def one(a, b):
        return ozaki.einsum("ik,kj->ij", a, b)

    got = np.asarray(jax.vmap(one)(A, B))
    want = np.asarray(jnp.einsum("gik,gkj->gij", A, B, optimize=True))
    denom = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / denom < 1e-11


def test_wide_dynamic_range():
    """Elements spanning ten orders of magnitude stay accurate in absolute
    terms (the fixed-point scheme is exact relative to the global scale)."""
    A = jnp.asarray(RNG.randn(40, 50) * np.logspace(-10, 0, 50)[None, :])
    B = jnp.asarray(RNG.randn(50, 30))
    got = np.asarray(ozaki.matmul(A, B))
    want = np.asarray(A @ B)
    assert np.max(np.abs(got - want)) < 1e-11 * np.max(np.abs(want))


def test_fallbacks():
    # three operands -> jnp.einsum
    x = jnp.asarray(RNG.randn(5, 6))
    y = jnp.asarray(RNG.randn(5, 6))
    z = jnp.asarray(RNG.randn(5, 6))
    got = np.asarray(ozaki.einsum("ia,ja,ka->ijk", x, y, z))
    want = np.asarray(jnp.einsum("ia,ja,ka->ijk", x, y, z, optimize=True))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # f32 inputs -> jnp.einsum
    a32 = jnp.asarray(RNG.randn(8, 9), dtype=jnp.float32)
    b32 = jnp.asarray(RNG.randn(9, 4), dtype=jnp.float32)
    got = np.asarray(ozaki.einsum("ik,kj->ij", a32, b32))
    assert got.dtype == np.float32


def test_zero_operand():
    A = jnp.zeros((6, 8))
    B = jnp.asarray(RNG.randn(8, 5))
    got = np.asarray(ozaki.einsum("ik,kj->ij", A, B))
    assert np.all(got == 0.0)


def test_long_contraction_narrow_slices():
    """K > 1024 forces narrower (6-bit) slices; accuracy must hold (this is
    the cc-pVTZ particle-particle-ladder regime)."""
    A = jnp.asarray(RNG.randn(12, 1600) * 0.3)
    B = jnp.asarray(RNG.randn(1600, 9))
    got = np.asarray(ozaki.matmul(A, B))
    want = np.asarray(A @ B)
    assert np.max(np.abs(got - want)) < 1e-10 * np.max(np.abs(want))
