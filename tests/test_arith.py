"""Unit tests for the int8/float decoder arithmetic vocabulary.

Golden-checks the saturating int8 semantics against a pure-Python scalar
model of the reference ops (``/root/reference/polar_helper.hh:113-229``),
with emphasis on the asymmetric-range edge cases (-128, the -127 clamps).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.ops import arith


def sat8(x):
    return int(np.clip(x, -128, 127))


def ref_qabs(a):
    return abs(max(a, -127))


def ref_qadd(a, b):
    return sat8(a + b)


def ref_prod(a, b):
    return int(np.sign(a)) * int(np.sign(b)) * min(ref_qabs(a), ref_qabs(b))


def ref_madd(a, b, c):
    # SIMD int8 path: sat8(sign(a) * max(b, -127) + c)
    return sat8(int(np.sign(a)) * max(b, -127) + c)


ALL_I8 = np.arange(-128, 128, dtype=np.int8)
EDGES = np.array([-128, -127, -126, -1, 0, 1, 126, 127], dtype=np.int8)
HARD = np.array([-1, 0, 1], dtype=np.int8)


def test_qabs_all_int8():
    got = np.asarray(arith.qabs(jnp.asarray(ALL_I8)))
    want = np.array([ref_qabs(int(a)) for a in ALL_I8], dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_qadd_exhaustive_edges():
    a, b = np.meshgrid(ALL_I8, EDGES)
    got = np.asarray(arith.qadd(jnp.asarray(a.ravel()), jnp.asarray(b.ravel())))
    want = np.array([ref_qadd(int(x), int(y)) for x, y in zip(a.ravel(), b.ravel())],
                    dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_prod_exhaustive_edges():
    a, b = np.meshgrid(ALL_I8, EDGES)
    got = np.asarray(arith.prod(jnp.asarray(a.ravel()), jnp.asarray(b.ravel())))
    want = np.array([ref_prod(int(x), int(y)) for x, y in zip(a.ravel(), b.ravel())],
                    dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_madd_exhaustive_hard_edges():
    hh, bb, cc = np.meshgrid(HARD, ALL_I8, EDGES)
    got = np.asarray(
        arith.madd(jnp.asarray(hh.ravel()), jnp.asarray(bb.ravel()),
                   jnp.asarray(cc.ravel()))
    )
    want = np.array(
        [ref_madd(int(a), int(b), int(c))
         for a, b, c in zip(hh.ravel(), bb.ravel(), cc.ravel())],
        dtype=np.int8,
    )
    np.testing.assert_array_equal(got, want)


def test_signum_decide_int8():
    s = np.asarray(arith.signum(jnp.asarray(ALL_I8)))
    d = np.asarray(arith.decide(jnp.asarray(ALL_I8)))
    np.testing.assert_array_equal(s, np.sign(ALL_I8.astype(np.int32)).astype(np.int8))
    np.testing.assert_array_equal(d, np.where(ALL_I8 < 0, -1, 1).astype(np.int8))


def test_decide_float_zero_is_positive():
    assert float(arith.decide(jnp.asarray(0.0))) == 1.0
    assert float(arith.decide(jnp.asarray(-0.5))) == -1.0


def test_flip():
    a = jnp.asarray([5, 5, -3], dtype=jnp.int8)
    b = jnp.asarray([-1, -1, -1], dtype=jnp.int8)
    c = jnp.asarray([2, 2, 2], dtype=jnp.int8)
    d = jnp.asarray([2, 3, 2], dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(arith.flip(a, b, c, d)), [-5, 5, 3])


@pytest.mark.parametrize(
    "x,want",
    [
        (0.4, 0), (0.5, 0), (1.5, 2), (2.5, 2), (-0.5, 0), (-1.5, -2),
        (127.4, 127), (127.6, 127), (500.0, 127), (-128.4, -128),
        (-1000.0, -128), (126.5, 126),
    ],
)
def test_quant_round_half_even_and_clamp(x, want):
    # std::nearbyint under default rounding = round-half-to-even
    assert int(arith.quant(jnp.asarray(x))) == want


def test_float_ops_match_minsum():
    rng = np.random.default_rng(0)
    a = rng.normal(size=100).astype(np.float32)
    b = rng.normal(size=100).astype(np.float32)
    f = np.asarray(arith.prod(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        f, np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b)), rtol=1e-6
    )
    h = np.where(rng.integers(0, 2, 100) > 0, 1.0, -1.0).astype(np.float32)
    g = np.asarray(arith.madd(jnp.asarray(h), jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(g, h * a + b, rtol=1e-6)
