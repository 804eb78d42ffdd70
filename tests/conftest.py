"""Test configuration: run JAX on CPU (float64, 8 virtual devices).

The dev box tunnels a single real TPU through the 'axon' platform, which is
slow to initialise and emulates f64 with float32 exponent range; unit tests
validate numerics on the CPU backend.  TPU-only behaviour is exercised by
bench.py and the driver's compile checks.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Quarantine: tests/test_ozaki.py segfaults XLA:CPU's
# backend_compile_and_load when compiled LATE in a long suite process
# (deterministic after ~83 tests; the same file passes in isolation with
# identical flags, and either half of the suite prefix + ozaki also passes
# -- the trigger is accumulated XLA:CPU compiler state, not our programs).
# The ozaki tests therefore run in their own subprocess
# (test_zz_ozaki_isolated.py); a direct `pytest tests/test_ozaki.py`
# invocation still works.  Tracked in README "Known issues".
_ozaki_explicit = any("test_ozaki" in a for a in sys.argv)
if os.environ.get("TUNA_TPU_OZAKI_ISOLATED") != "1" and not _ozaki_explicit:
    collect_ignore = ["test_ozaki.py"]
