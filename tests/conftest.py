"""Test configuration: run JAX on CPU (float64, 8 virtual devices).

The dev box tunnels a single real TPU through the 'axon' platform, which is
slow to initialise and emulates f64 with float32 exponent range; unit tests
validate numerics on the CPU backend.  TPU-only behaviour is exercised by
bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
