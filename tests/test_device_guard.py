"""Regression guard for the silent-CPU-leak class (round 3's measurement
bug): arrays committed to the CPU backend by a host-fallback stage must be
caught before they drag downstream jits onto the host."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuna_tpu.ops import device_guard


def test_noop_on_cpu_backend():
    # On a CPU-only host there is nothing to leak to.
    device_guard.assert_on_accelerator({"x": jnp.ones(3)})


def test_flags_cpu_committed_arrays(monkeypatch):
    x = jax.device_put(jnp.ones(3), jax.devices("cpu")[0])
    monkeypatch.setattr(device_guard, "_default_platform", lambda: "tpu")
    with pytest.raises(device_guard.DevicePlacementError) as err:
        device_guard.assert_on_accelerator({"ERI": x}, stage="integral generation")
    assert "ERI" in str(err.value)
    assert "integral generation" in str(err.value)


def test_skips_none_and_host_data(monkeypatch):
    monkeypatch.setattr(device_guard, "_default_platform", lambda: "tpu")
    # None entries (DIRECT defers the ERI) and plain numpy arrays (host-side
    # metadata) must not trip the guard.
    assert device_guard._offending_devices(np.ones(3)) is None
    with pytest.raises(device_guard.DevicePlacementError):
        device_guard.assert_on_accelerator(
            {"ERI": None, "S": jax.device_put(jnp.ones(2), jax.devices("cpu")[0])})
