"""Tests for constants, config/keyword system, registries, basis loading and
spherical-harmonic transformations."""

import numpy as np
import pytest

from tuna_tpu import constants
from tuna_tpu.basis import BASIS_TABLES, generate_basis, mangle_basis_name
from tuna_tpu.config import Config
from tuna_tpu.methods import (BASIS_ALIASES, CALCULATION_TYPES,
                              ELECTRONIC_STRUCTURE_METHODS, XC_FUNCTIONALS,
                              lookup_method)
from tuna_tpu.output import TunaError
from tuna_tpu.spherical import build_transformation_matrix, shell_transform


def make_config(params, method="HF", calc="SPE", symbols=("H", "H"), basis="STO-3G"):
    return Config(calc, lookup_method(method), 0.0, list(params), basis, list(symbols), True)


def test_constants():
    assert abs(constants.BOHR_IN_ANGSTROM - 0.529177) < 1e-5
    assert abs(constants.EV_IN_HARTREE - 27.2114) < 1e-3
    assert abs(constants.ATOMIC_TIME_IN_FS - 0.0241888) < 1e-6


def test_registries():
    names = {m.name for m in ELECTRONIC_STRUCTURE_METHODS}
    for required in ["HF", "MP2", "CCSD", "CCSD(T)", "B3LYP", "CIS", "TDHF",
                     "CCSDTQ", "OMP2", "SCS-MP3", "QCISD(T)", "B97M-V"]:
        assert required in names
    assert len(CALCULATION_TYPES) == 11
    assert XC_FUNCTIONALS["B3LYP"].HFX == 0.20
    assert XC_FUNCTIONALS["PBE0"].functional_type == "hybrid"
    assert XC_FUNCTIONALS["B2PLYP"].functional_type == "double-hybrid"


def test_method_lookup():
    m = lookup_method("UCCSD")
    assert m.unrestricted and m.name == "CCSD"
    assert lookup_method("HF").name == "HF"
    assert lookup_method("NOPE") is None
    assert lookup_method("ULMP2") == "restricted_only"


def test_keyword_defaults():
    cfg = make_config([])
    assert cfg.charge == 0 and cfg.multiplicity == 1
    assert cfg.DIIS is True and cfg.max_DIIS_matrices == 6
    assert cfg.damping is True and cfg.damping_factor is None
    assert cfg.MO_read is True
    assert cfg.SCF_conv["name"] == "medium"
    assert cfg.temperature == 298.15


def test_keyword_values_and_overrides():
    cfg = make_config(["CH", "1", "ML", "2", "DAMP", "0.3", "NODIIS", "MAXITER", "50"])
    assert cfg.charge == 1 and cfg.multiplicity == 2
    assert cfg.damping_factor == 0.3
    assert cfg.DIIS is False
    assert cfg.max_iter == 50


def test_derivative_driven_convergence_tiers():
    assert make_config([], calc="OPT").SCF_conv["name"] == "tight"
    assert make_config([], calc="FREQ").SCF_conv["name"] == "extreme"
    assert make_config(["LOOSE"], calc="FREQ").SCF_conv["name"] == "loose"
    cfg = make_config(["ECONV", "1e-11"])
    assert cfg.SCF_conv["delta_E"] == 1e-11


def test_guess_selection():
    assert make_config([]).self_consistent_guess
    assert make_config(["COREGUESS"]).core_guess
    assert make_config(["SADGUESS"]).superposition_guess
    # monatomic defaults to core guess
    assert make_config([], symbols=("H",)).core_guess


def test_slowconv_and_fields():
    cfg = make_config(["SLOWCONV", "EZ", "0.01"])
    assert cfg.damping_factor == 0.5
    assert np.allclose(cfg.electric_field, [0, 0, 0.01])


def test_missing_value_errors():
    with pytest.raises(TunaError):
        make_config(["CH"])


def test_basis_tables():
    assert mangle_basis_name("cc-pVDZ") == "CC_PVDZ"
    assert mangle_basis_name("6-31G**") == "_6_31GSTARSTAR"
    assert mangle_basis_name("6-31+G(d,p)") == "_6_31PLUSGBRADCOMMAPKET"
    sto = generate_basis("STO-3G", 1)
    assert 1 in sto and sto[1][0][0] == "S"
    assert len(sto[1][0][1]) == 3
    # every alias target resolves to a stored table (except CUSTOM)
    for typed, canonical in BASIS_ALIASES.items():
        if canonical == "custom":
            continue
        assert mangle_basis_name(canonical) in BASIS_TABLES, canonical


def test_spherical_blocks():
    # d block matches the reference convention exactly
    UD = shell_transform(2)
    ref = np.array([
        [0, 1, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0],
        [0, 0, 0, 0, 1, 0],
        [np.sqrt(3) / 2, 0, 0, -np.sqrt(3) / 2, 0, 0],
        [-0.5, 0, 0, -0.5, 0, 1],
    ])
    np.testing.assert_allclose(UD, ref, atol=1e-14)
    assert shell_transform(0).shape == (1, 1)
    np.testing.assert_allclose(shell_transform(1), np.eye(3), atol=1e-14)
    U = build_transformation_matrix([0, 1, 2])
    assert U.shape == (1 + 3 + 5, 1 + 3 + 6)


def test_custom_basis_parser(tmp_path):
    content = """$basis
HYDROGEN
S 2
 1  1.0D+00  0.4
 2  2.0D-01  0.7
L 1
 1  5.0D-01  0.3  0.2
"""
    f = tmp_path / "mybasis.tuna"
    f.write_text(content)
    from tuna_tpu.basis import parse_custom_basis
    table = parse_custom_basis(str(f))
    assert 1 in table
    letters = [shell[0] for shell in table[1]]
    assert letters == ["S", "S", "P"]
    assert table[1][1][1] == [(0.5, 0.3)]
    assert table[1][2][1] == [(0.5, 0.2)]


def test_extra_colon_sections_drop_keywords_with_warning(capsys):
    # The reference parses keywords only from a four-section line
    # (tuna.py:98): ": TIGHTSCF : P" silently loses BOTH keywords.  Parse
    # behaviour must match; ours additionally warns.
    from tuna_tpu.cli import parse_input
    (_, _, _, _, _, params) = parse_input(
        "SPE : H H 0.74 : HF STO-3G : TIGHTSCF : P")
    assert list(params) == []
    assert "keywords ignored" in capsys.readouterr().out.lower()
    (_, _, _, _, _, params4) = parse_input(
        "SPE : H H 0.74 : HF STO-3G : TIGHTSCF P")
    assert list(params4) == ["TIGHTSCF", "P"]
