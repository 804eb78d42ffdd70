"""Ozaki-scheme f64 contractions from bf16 integer-slice matmuls.

XLA's emulated-f64 dot on TPU costs ~40 us per op regardless of size (and
~6x f32 FLOPs at large sizes), which makes the f64 residual evaluations of
the Newton finisher the dominant cost of a coupled-cluster solve.  This
module computes f64-accurate contractions out of EXACT low-precision
matmuls instead (Ozaki et al., "Error-free transformations of matrix
multiplication", Numer. Algorithms 59 (2012); the fixed-point variant):

  1. scale each operand by a power of two so |X| <= 1;
  2. peel the mantissa into 7-bit integer slices  X = s * sum_k 2^(-7k) I_k
     (each I_k an integer in [-128, 128], held EXACTLY in bfloat16);
  3. multiply slice pairs on the MXU: bf16 x bf16 -> f32 dots of integers.
     Products are <= 2^14 and contraction lengths K < 2^10 keep every
     partial sum below 2^24, so each slice-pair dot is EXACT;
  4. recombine the partial products with their power-of-two weights in f64
     (cheap fused elementwise work).

With 7 slices and pair cutoff i+j <= 8 the result carries ~2^-42 relative
error versus true f64 -- far below the 1e-10 the amplitude equations need --
while every FLOP runs at native MXU speed.  No reference counterpart
(the reference is CPU NumPy f64 throughout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Slice width is chosen per contraction so every slice-pair dot is EXACT:
# products of two b-bit integer slices are < 2^(2b), and summing K of them
# stays below the f32 integer limit 2^24 when 2b + ceil(log2 K) <= 24.
# Wider contractions get narrower slices (and correspondingly more of them).
#
# TARGET_BITS trades accuracy for slice-pair count: 36 bits drops ~20% of
# the matmuls at large contraction lengths (45 -> 36 pairs at K = 53^2;
# measured 8.20 -> 7.77 ms per cc-pVTZ CCSD residual) but raises the
# residual-norm noise floor to ~1e-9, which blocks the Newton finisher's
# step-2 certification shortcut (r < 0.1*energy_conv = 1e-10 at TIGHTSCF)
# and costs a whole extra ~6 ms Newton step -- more than the ~0.4 ms the
# narrower slices save.  42 bits (~2e-13 relative, floor ~1e-11) keeps the
# shortcut live and the final-energy parity at ~1e-10.  Override
# per-process with TUNA_TPU_OZAKI_BITS.
TARGET_BITS = int(__import__("os").environ.get("TUNA_TPU_OZAKI_BITS", 42))
MIN_SLICE_BITS = 4
MAX_EXACT_K = 1 << (24 - 2 * MIN_SLICE_BITS)

# The slice scheme beats XLA's emulated-f64 dots in BOTH regimes on the
# real chip (round-4 re-measurement, tools/profile_cc_residual.py: per
# fused CCSD residual 8.7 -> 5.2 ms at N2/6-311G, 18.1 -> 7.8 ms at
# N2/cc-pVTZ; the round-3 "slower at large sizes" gating was measured while
# the pipeline was silently running on one CPU core).  Each slice-pair bf16
# pass runs at ~154 Tflop/s vs ~1.86 Tflop/s emulated, so the ~30-pass
# scheme keeps a ~5x FLOP-rate edge at ANY size; the bound below only
# guards against pathological single contractions (HBM pressure of the
# slice buffers), not a measured crossover.
MAX_OZAKI_FLOPS = float(__import__("os").environ.get(
    "TUNA_TPU_OZAKI_MAX_FLOPS", 2e10))


def _plan(K, target_bits=None):
    """(slice_bits, n_slices, pair_cutoff) for a contraction of length K."""
    tb = TARGET_BITS if target_bits is None else target_bits
    logk = max(1, int(np.ceil(np.log2(max(K, 2)))))
    # cap at 8: slice integers up to 2^bits must be exact in bf16's 8-bit
    # significand
    bits = min(8, (24 - logk) // 2)
    if bits < MIN_SLICE_BITS:
        return None
    cutoff = 1 + int(np.ceil((tb + logk) / bits))
    n_slices = min(cutoff - 1, int(np.ceil(54 / bits)))
    return bits, n_slices, cutoff


def _pow2_scale(X):
    """Smallest power of two >= max|X| (a traced f64 scalar).

    The zero-tensor floor must stay inside FLOAT32 exponent range: TPU f64
    is a double-single pair whose exponent field is f32's, so 1e-300
    underflows to 0 there and a 0/0 NaN would poison the solve."""
    m = jnp.max(jnp.abs(X))
    safe = jnp.maximum(m, 1e-30)
    return jnp.exp2(jnp.ceil(jnp.log2(safe)))


def split_fixed_point(X, bits, n_slices):
    """X (f64) -> (scale, [bf16 integer slices]) with
    X = scale * sum_k 2^(-bits*k) I_k + O(2^(-bits*n_slices) * scale)."""
    scale = _pow2_scale(X)
    r = X / scale
    slices = []
    step = jnp.float64(1 << bits)
    for _ in range(n_slices):
        r = r * step
        I = jnp.rint(r)
        r = r - I
        slices.append(I.astype(jnp.bfloat16))
    return scale, slices


def _matmul_sliced(sa, A_slices, sb, B_slices, bits, cutoff):
    """Exact-slice matmul: returns the f64 product of the represented
    operands, shape (M, N) -- or (G, M, N) when the slices carry a leading
    batch ("group") axis, in which case each bf16 pass is ONE batched
    dot_general (one MXU dispatch for the whole group instead of G)."""
    batched = A_slices[0].ndim == 3
    dims = ((((2,), (1,)), ((0,), (0,))) if batched
            else ((((1,), (0,)), ((), ()))))
    total = None
    for i, Ai in enumerate(A_slices, start=1):
        for j, Bj in enumerate(B_slices, start=1):
            if i + j > cutoff:
                continue
            P = jax.lax.dot_general(Ai, Bj, dims,
                                    preferred_element_type=jnp.float32)
            w = 2.0 ** (-bits * (i + j))
            term = P.astype(jnp.float64) * w
            total = term if total is None else total + term
    return total * (sa * sb)


# Trace-time split cache: within one jit trace, the SAME operand object
# (an integral block, t2, tau, ...) feeds many contractions; splitting it
# once in its native shape and transposing the cheap bf16 slices per use
# beats re-splitting (21 f64 elementwise ops) at every call site.  Keys hold
# the operand itself to guard against id() reuse; entries are tracers whose
# lifetime is the trace, so the cache is cleared opportunistically when it
# grows.
_SPLIT_TRACE_CACHE: dict = {}


def _split_cached(X, bits, n_slices):
    # Only cache TRACERS: their lifetime is one trace and reuse within it is
    # the whole point.  Caching concrete arrays (eager calls) would pin the
    # operand plus ~3x its bytes of bf16 slices in device memory until the
    # high-water-mark clear.
    if not isinstance(X, jax.core.Tracer):
        return split_fixed_point(X, bits, n_slices)
    key = (id(X), bits, n_slices)
    hit = _SPLIT_TRACE_CACHE.get(key)
    if hit is not None and hit[0] is X:
        return hit[1]
    if len(_SPLIT_TRACE_CACHE) > 4096:
        _SPLIT_TRACE_CACHE.clear()
    result = split_fixed_point(X, bits, n_slices)
    _SPLIT_TRACE_CACHE[key] = (X, result)
    return result


def warm_presplits(tensors, K_values):
    """Populate the trace-time split cache for loop-invariant operands.

    Call BEFORE tracing a lax.while_loop body: the cached slice tracers are
    then created OUTSIDE the loop, so every in-loop einsum reuses them as
    loop constants instead of re-peeling multi-MB integral blocks on every
    iteration (measured: ~1 s/iteration of f64-emulated splitting at
    cc-pVTZ without this).  Variants for contraction lengths that never
    occur are pruned by XLA dead-code elimination, so over-warming is free.
    """
    for X in tensors:
        if not hasattr(X, "dtype") or X.dtype != jnp.float64:
            continue
        for K in K_values:
            plan = _plan(int(K))
            if plan is not None:
                _split_cached(X, plan[0], plan[1])


def _parse(subscripts):
    lhs, out = subscripts.replace(" ", "").split("->")
    a_sub, b_sub = lhs.split(",")
    if len(set(a_sub)) != len(a_sub) or len(set(b_sub)) != len(b_sub):
        return None  # diagonal/trace inputs: not supported
    shared = [c for c in a_sub if c in b_sub]
    batch = [c for c in shared if c in out]          # group axes (bmm)
    contracted = [c for c in shared if c not in out]
    a_free = [c for c in a_sub if c not in shared]
    b_free = [c for c in b_sub if c not in shared]
    if set(out) != set(batch + a_free + b_free):
        return None
    return a_sub, b_sub, out, a_free, b_free, contracted, batch


def einsum(subscripts, *operands, **kwargs):
    """Two-operand einsum with the Ozaki slice scheme.

    Falls back to jnp.einsum when the inputs are not f64, the contraction is
    too long for exact slices, the spec has batch/diagonal structure, or
    there are not exactly two operands."""
    if len(operands) != 2:
        return jnp.einsum(subscripts, *operands, optimize=True)
    A, B = operands
    spec = _parse(subscripts) if "->" in subscripts else None
    if (spec is None or A.dtype != jnp.float64 or B.dtype != jnp.float64):
        return jnp.einsum(subscripts, A, B, optimize=True)
    a_sub, b_sub, out, a_free, b_free, contracted, batch = spec

    a_shape = dict(zip(a_sub, A.shape))
    b_shape = dict(zip(b_sub, B.shape))
    K = int(np.prod([a_shape[c] for c in contracted])) if contracted else 1
    plan = _plan(K) if K > 1 else None
    if plan is None:
        return jnp.einsum(subscripts, A, B, optimize=True)
    bits, n_slices, cutoff = plan

    G = int(np.prod([a_shape[c] for c in batch])) if batch else 1
    M = int(np.prod([a_shape[c] for c in a_free])) if a_free else 1
    N = int(np.prod([b_shape[c] for c in b_free])) if b_free else 1
    if 2.0 * G * M * K * N > MAX_OZAKI_FLOPS:
        return jnp.einsum(subscripts, A, B, optimize=True)

    # Split in native shape (cached per operand per trace), then move the
    # cheap bf16 slices into (batched) matmul layout:
    # A -> (batch..., free..., contracted...) -> ([G,] M, K)
    # B -> (batch..., contracted..., free...) -> ([G,] K, N)
    perm_a = [a_sub.index(c) for c in batch + a_free + contracted]
    perm_b = [b_sub.index(c) for c in batch + contracted + b_free]
    shape_a = (G, M, K) if batch else (M, K)
    shape_b = (G, K, N) if batch else (K, N)
    sa, A_native = _split_cached(A, bits, n_slices)
    sb, B_native = _split_cached(B, bits, n_slices)
    A_slices = [sl.transpose(perm_a).reshape(shape_a) for sl in A_native]
    B_slices = [sl.transpose(perm_b).reshape(shape_b) for sl in B_native]
    C = _matmul_sliced(sa, A_slices, sb, B_slices, bits, cutoff)

    C = C.reshape([a_shape[c] for c in batch] + [a_shape[c] for c in a_free]
                  + [b_shape[c] for c in b_free])
    order = [(batch + a_free + b_free).index(c) for c in out]
    return C.transpose(order)


def matmul(A, B):
    """f64-accurate (M,K) @ (K,N) through the slice scheme.

    Contractions too long for an exact slice plan (K > 2^16) fall back to
    the plain (emulated) f64 dot."""
    plan = _plan(A.shape[1])
    if plan is None:
        return jnp.dot(A, B)
    bits, n_slices, cutoff = plan
    sa, A_slices = split_fixed_point(A, bits, n_slices)
    sb, B_slices = split_fixed_point(B, bits, n_slices)
    return _matmul_sliced(sa, A_slices, sb, B_slices, bits, cutoff)
