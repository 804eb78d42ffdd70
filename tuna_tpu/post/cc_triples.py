"""Iterative triples / quadruples methods: CISDT, CCSDT, CCSDTQ.

Capability parity target: /root/reference/TUNA/tuna_cc.py:830-2687 (iterative
kernels incl. the null-space projection of triples amplitudes, :2003-2036).
"""

from __future__ import annotations

from ..output import error


def solve_triples_method(g, o, v, t_amplitudes, e_denominators, F, method,
                         base_name, calculation, silent):
    error(f"The {base_name} method is not yet available in TUNA-TPU!")
