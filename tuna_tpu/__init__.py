"""TUNA-TPU: a TPU-native quantum chemistry framework for atoms and diatomics.

A ground-up JAX/XLA rebuild with the capability matrix of the reference TUNA
package (CLI grammar `CALC : A B R : METHOD BASIS : KEYWORDS`): HF/DFT/MPn/
CC/CI electronic structure, geometry optimisation, frequencies, ab-initio MD
and property calculations -- with batched on-device molecular integrals,
jit-compiled SCF and correlation solvers, and autodiff derivatives.
"""

__version__ = "0.2.0"

import os as _os
import pathlib as _pathlib

import jax as _jax

# f64 numerics everywhere: chemical accuracy targets (1e-8 Ha) are
# unreachable in f32.  On TPU this uses XLA's double-single emulation.
_jax.config.update("jax_enable_x64", True)

# TPU matmuls in f32 default to ONE bf16 pass (~3 significant digits), which
# silently caps the f32 warm solves and the Newton finisher's Jacobian at
# bf16 accuracy (measured: 5 Newton steps instead of 2).  Full-precision f32
# (6-pass) still runs ~100x faster than emulated f64; nothing in quantum
# chemistry wants silent bf16.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles of the integral/SCF/CC kernels
# are expensive (minutes through the remote-compile tunnel) but fully
# reusable across processes; warm runs then start in seconds.
_cache_dir = _os.environ.get(
    "TUNA_TPU_COMPILE_CACHE",
    str(_pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
# CPU executables are machine-feature-specific (AOT loads can SIGILL across
# heterogeneous hosts); only accelerator compiles are worth persisting.  An
# unset/empty JAX_PLATFORMS resolves to CPU on CPU-only hosts, so it is
# treated as CPU here; set TUNA_TPU_COMPILE_CACHE explicitly to opt in.
if (_os.environ.get("JAX_PLATFORMS", "").lower() in ("", "cpu")
        and not _os.environ.get("TUNA_TPU_COMPILE_CACHE")):
    _cache_dir = None
if _cache_dir and _cache_dir != "0":
    # Namespace the cache by a host fingerprint: CPU executables persisted
    # from in-process cpu-backend jits (e.g. the f-shell ERI fallback) are
    # machine-feature-specific, and entries carried over from a different
    # host produce "cpu_aot_loader" feature-mismatch errors (or SIGILL) when
    # loaded.  A per-host subdirectory means foreign entries are never seen.
    def _host_fingerprint():
        import hashlib
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        return hashlib.sha1(line.encode()).hexdigest()[:12]
        except OSError:
            pass
        import platform
        return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]

    _cache_dir = str(_pathlib.Path(_cache_dir) / _host_fingerprint())
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
