"""TUNA-TPU: a TPU-native quantum chemistry framework for atoms and diatomics.

A ground-up JAX/XLA rebuild with the capability matrix of the reference TUNA
package (CLI grammar `CALC : A B R : METHOD BASIS : KEYWORDS`): HF/DFT/MPn/
CC/CI electronic structure, geometry optimisation, frequencies, ab-initio MD
and property calculations -- with batched on-device molecular integrals,
jit-compiled SCF and correlation solvers, and autodiff derivatives.
"""

__version__ = "0.1.0"

import jax as _jax

# f64 numerics everywhere: chemical accuracy targets (1e-8 Ha) are
# unreachable in f32.  On TPU this uses XLA's double-single emulation.
_jax.config.update("jax_enable_x64", True)
