"""Run tests/test_ozaki.py in a fresh subprocess.

XLA:CPU's backend_compile_and_load segfaults compiling the ozaki
slice-matmul programs late in a long suite process (deterministic at ~83
prior tests; passes in isolation and after either HALF of the suite prefix,
so the trigger is accumulated compiler state in one process, not the
programs themselves).  Until the upstream bug is gone, the ozaki tests run
isolated; conftest.py un-collects test_ozaki.py from the parent process.
Named test_zz_* so the subprocess runs LAST -- its several minutes of
compile don't delay feedback from the rest of the suite.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.parametrize("flags", ["-m not slow"])
def test_ozaki_suite_in_subprocess(flags):
    env = dict(os.environ, TUNA_TPU_OZAKI_ISOLATED="1")
    target = os.path.join(os.path.dirname(__file__), "test_ozaki.py")
    result = subprocess.run(
        [sys.executable, "-m", "pytest", target, "-q"] + flags.split(" ", 1),
        env=env, capture_output=True, text=True, timeout=1800)
    assert result.returncode == 0, (
        "isolated ozaki suite failed:\n"
        + result.stdout[-3000:] + "\n" + result.stderr[-2000:])
