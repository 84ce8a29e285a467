"""Native C extension parity tests (skipped when not built).

Build with ``python csrc/setup.py build_ext --inplace``.
"""

import math

import numpy as np
import pytest

import polar_tpu as pt
from polar_tpu.code import native

pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="_polar_native not built"
)


@pytest.mark.parametrize("m", [1, 4, 8, 12, 16])
def test_native_fixed_k_matches_numpy(m):
    k = (1 << m) // 2
    a = native.frozen_mask_fixed_k(m, k, math.exp(-1))
    b = pt.frozen_mask_fixed_k(m, k, math.exp(-1))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("m", [3, 8, 12])
@pytest.mark.parametrize("pe,th", [(0.5, 0.5), (0.3, 1e-7)])
def test_native_threshold_matches_numpy(m, pe, th):
    a = native.frozen_mask_threshold(m, pe, th)
    b = pt.frozen_mask_threshold(m, pe, th)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("m", [2, 6, 10, 14])
def test_native_program_matches_numpy(m):
    for rate in (0.25, 0.5, 0.75):
        mask = native.frozen_mask_fixed_k(m, int(rate * (1 << m)), math.exp(-1))
        a = native.compile_program(mask, m)
        b = pt.compile_program(pt.PolarCode(m, mask))
        np.testing.assert_array_equal(a, b)


def test_native_logpe_matches_numpy():
    for m in (4, 10, 15):
        a = native.bhattacharyya_logpe(m, 0.37)
        b = pt.bhattacharyya_logpe(m, 0.37)
        # rtol: ±1-ulp formula differences double per level (~3e-16
        # relative at level 15); atol: leftmost leaves where log pe → 0⁻
        np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-12)


def test_native_large_n():
    """Construction + compile at N=2^20 complete quickly and agree on K."""
    m = 20
    mask = native.frozen_mask_fixed_k(m, 1 << 19)
    assert int((mask == 0).sum()) == 1 << 19
    prog = native.compile_program(mask, m)
    assert prog[0] == m and prog[-1] == 255


def test_native_errors():
    with pytest.raises(ValueError):
        native.frozen_mask_fixed_k(40, 10)
    if native.have_native():
        import _polar_native

        with pytest.raises(ValueError):
            _polar_native.compile_program(b"\x01\x02", 4)
