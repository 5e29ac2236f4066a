"""Codebook construction tests (reference tests/test_functional.py:253-327)."""

import numpy as np
import pytest

from bitsandbytes_tpu.functional.codebooks import (
    create_dynamic_map,
    create_fp8_map,
    create_linear_map,
    create_normal_map,
    get_4bit_code,
)

# Reference NF4 table (bitsandbytes/functional.py:788-805 / QLoRA paper).
NF4_REF = [
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
]


def test_nf4_code_exact():
    code = get_4bit_code("nf4")
    np.testing.assert_allclose(code, NF4_REF, rtol=0, atol=0)


def test_normal_map_matches_hardcoded():
    nm = create_normal_map()
    nonzero = nm[nm != 0]
    # 15 non-zero values; hardcoded table is the same values (+ explicit 0)
    assert nonzero.size == 15
    table = sorted(set(NF4_REF) - {0.0})
    np.testing.assert_allclose(sorted(nonzero.tolist()), table, atol=2e-7)


def test_fp4_code():
    code = get_4bit_code("fp4")
    # bit-pattern order: 0b010 = 8/12, 0b011 = 1.0 (max), sign bit flips
    assert code[0] == 0.0
    assert code[3] == 1.0
    assert code[11] == -1.0
    np.testing.assert_allclose(code[1], 0.0625 / 12)
    # sign symmetry between bit patterns 0bXYZ and 0b1XYZ
    np.testing.assert_allclose(code[:8], -code[8:])


def test_dynamic_map_properties():
    code = create_dynamic_map()
    assert code.shape == (256,)
    # the signed dynamic map appends +1.0 but not -1.0 (reference
    # functional.py:340-341): max is 1.0, min is ~-0.993
    assert code[-1] == 1.0
    assert abs(code[0] + 0.99296874) < 1e-6
    assert (np.sort(code) == code).all()
    assert (code == 0).sum() == 1  # exactly one zero
    # negative side mirrors the positive side except the appended 1.0
    pos = code[code > 0]
    neg = code[code < 0]
    np.testing.assert_allclose(np.sort(-neg), pos[:-1], atol=0)


def test_dynamic_map_unsigned():
    code = create_dynamic_map(signed=False)
    assert code.shape == (256,)
    assert code[-1] == 1.0
    assert (code >= 0).all()


@pytest.mark.parametrize("e,p", [(2, 1), (3, 0), (4, 3), (5, 2)])
def test_fp8_map_monotone(e, p):
    code = create_fp8_map(True, e, p, 4 if e + p == 3 else 8)
    assert (np.diff(code) >= 0).all()
    assert code.max() == 1.0 and code.min() == -1.0


def test_linear_map():
    code = create_linear_map(signed=True)
    assert code.shape == (256,)
    assert code[0] == -1.0 and code[-1] == 1.0


def test_af4_code():
    code = get_4bit_code("af4")
    assert code.shape == (16,)
    assert np.abs(code).max() == 1.0
    with pytest.raises(NotImplementedError):
        get_4bit_code("af4", blocksize=128)
