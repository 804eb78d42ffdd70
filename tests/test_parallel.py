"""Multi-device data parallelism: a sharded batched PES scan on the 8-device
virtual CPU mesh must reproduce the serial single-point energies."""

import time

import numpy as np
import pytest

from tuna_tpu.cli import parse_input, process_method, run
from tuna_tpu.config import Config


@pytest.mark.smoke
def test_sharded_scan_matches_serial():
    import jax
    from tuna_tpu import parallel

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    mesh = parallel.device_mesh(8)

    ct, ms, basis, symbols, coords, params = parse_input("SPE : H H 0.74 : HF STO-3G : EXTREMESCF")
    cfg = Config(ct, process_method(ms), time.time(), params, basis, symbols,
                 suppress_output=True)

    bond_lengths = np.linspace(1.2, 1.9, 8)
    energies, converged = parallel.scan_energies_parallel(cfg, symbols,
                                                          bond_lengths, mesh)
    assert converged.all()

    for R, E_batch in zip(bond_lengths[:3], energies[:3]):
        line = f"SPE : H H {R * 0.529177210544:.12f} : HF STO-3G : EXTREMESCF"
        E_serial = run(line, suppress_output=True)[2]
        assert abs(E_batch - E_serial) < 1e-8, (R, E_batch, E_serial)
