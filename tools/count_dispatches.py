"""Count device dispatches per pipeline stage of a CLI run.

Through the axon tunnel every dispatched executable costs a ~25 ms round
trip (PERF.md), so the warm-start wall of a CLI run is roughly
(dispatch count) x 25 ms + (load cost of the big kernels).  This tool
attributes the dispatch count to pipeline stages so eager-op hot spots can
be found and batched into fewer jitted calls -- on the CPU backend, where
it runs in seconds.

Counting hook: EvalTrace.process_primitive sees every eager primitive
application (each one is a separate device executable, i.e. one round
trip) AND every Python-path jit invocation (primitive name "pjit"/"jit").
Warm repeats of the same jit call can take a C++ fastpath that bypasses
Python, so jit-call counts are lower bounds; eager counts are exact.

Usage:  python tools/count_dispatches.py ["CLI line"]
        default line: SPE : N N 1.1 : CCSD 6-311G : TIGHTSCF
"""
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import tuna_tpu  # noqa: F401
import jax
import jax._src.core as _core

EAGER = Counter()
JIT = Counter()
HOST = Counter()
_STAGE = ["<init>"]


def set_stage(name):
    _STAGE[0] = name


_orig_process = _core.EvalTrace.process_primitive
SITES = Counter()


def _user_site():
    f = sys._getframe(2)
    while f is not None:
        fn = f.f_code.co_filename
        if "/tuna_tpu/" in fn or fn.endswith(("bench.py", "__graft_entry__.py")):
            return f"{fn.rsplit('/repo/', 1)[-1]}:{f.f_lineno}"
        f = f.f_back
    return "<library>"


def _host_pinned():
    """True when a jax.default_device(cpu) context pins this op to the host
    (zero tunnel cost on a TPU backend, e.g. ops.integrals.cross_overlap)."""
    try:
        dev = jax._src.config.default_device.value
    except AttributeError:
        return False
    return dev is not None and dev.platform == "cpu"


def _counting_process(self, primitive, args, params):
    name = primitive.name
    if name in ("pjit", "jit"):
        label = getattr(params.get("jaxpr"), "jaxpr", None)
        fn = params.get("name") or (
            label.debug_info.func_name if label is not None and
            getattr(label, "debug_info", None) else "?")
        JIT[(_STAGE[0], fn)] += 1
    elif _host_pinned():
        HOST[(_STAGE[0], name)] += 1
    else:
        EAGER[(_STAGE[0], name)] += 1
        SITES[_user_site()] += 1
    return _orig_process(self, primitive, args, params)


_core.EvalTrace.process_primitive = _counting_process


def main():
    line = sys.argv[1] if len(sys.argv) > 1 else \
        "SPE : N N 1.1 : CCSD 6-311G : TIGHTSCF"

    from tuna_tpu.cli import parse_input, process_method
    from tuna_tpu.config import Config
    from tuna_tpu.drivers import energy as energy_mod

    set_stage("parse")
    ct, ms, bs, syms, coords, params = parse_input(line)
    cfg = Config(ct, process_method(ms), time.time(), params, bs, syms,
                 suppress_output=True)

    set_stage("calculate_energy")
    t0 = time.perf_counter()
    energy_mod.calculate_energy(cfg, syms, coords, silent=True)
    wall = time.perf_counter() - t0

    n_eager = sum(EAGER.values())
    n_jit = sum(JIT.values())
    n_host = sum(HOST.values())
    print(f"backend={jax.default_backend()} wall={wall:.1f}s")
    print(f"TOTAL device dispatches: {n_eager} eager + {n_jit} jit-call "
          f"(lower bound) = {n_eager + n_jit}  "
          f"(~{(n_eager + n_jit) * 25e-3:.1f} s at 25 ms/round-trip), "
          f"plus {n_host} host-pinned eager ops (tunnel-free)")
    print("\neager primitives by stage (top 40):")
    for (stage, prim), n in EAGER.most_common(40):
        print(f"  {n:5d}  {stage:20s} {prim}")
    print("\njit calls by (stage, function) (top 40):")
    for (stage, fn), n in JIT.most_common(40):
        print(f"  {n:5d}  {stage:20s} {fn}")
    print("\neager ops by user call site (top 40):")
    for site, n in SITES.most_common(40):
        print(f"  {n:5d}  {site}")


if __name__ == "__main__":
    main()
