"""Exhaustive proof-by-test that QuantFloatArith == Int8Arith.

The qfloat trick (int8 saturation semantics carried in bf16/f32 floats)
is only valid if every op is exact on the int8 domain. These tests sweep
the FULL int8 × int8 input space for the binary ops (65,536 pairs) in
both bfloat16 and float32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.ops.arith import Int8Arith, QuantFloatArith

I8 = Int8Arith()
ALL = np.arange(-128, 128, dtype=np.int8)
A, B = np.meshgrid(ALL, ALL)
A, B = A.ravel(), B.ravel()
HARD = np.array([-1, 0, 1], dtype=np.int8)


@pytest.fixture(params=[jnp.bfloat16, jnp.float32], ids=["bf16", "f32"])
def qf(request):
    return QuantFloatArith(request.param)


def _cmp(got_f, want_i8):
    got = np.asarray(got_f.astype(jnp.float32)).astype(np.int32)
    np.testing.assert_array_equal(got, np.asarray(want_i8).astype(np.int32))


def test_qadd_exhaustive(qf):
    a8, b8 = jnp.asarray(A), jnp.asarray(B)
    af, bf = a8.astype(qf.dtype), b8.astype(qf.dtype)
    _cmp(qf.qadd(af, bf), I8.qadd(a8, b8))


def test_prod_exhaustive(qf):
    a8, b8 = jnp.asarray(A), jnp.asarray(B)
    af, bf = a8.astype(qf.dtype), b8.astype(qf.dtype)
    _cmp(qf.prod(af, bf), I8.prod(a8, b8))


def test_madd_exhaustive_hard(qf):
    for h in (-1, 0, 1):
        h8 = jnp.full(A.shape, h, jnp.int8)
        a8, b8 = jnp.asarray(A), jnp.asarray(B)
        hf = h8.astype(qf.dtype)
        _cmp(
            qf.madd(hf, a8.astype(qf.dtype), b8.astype(qf.dtype)),
            I8.madd(h8, a8, b8),
        )


def test_unary_exhaustive(qf):
    a8 = jnp.asarray(ALL)
    af = a8.astype(qf.dtype)
    _cmp(qf.qabs(af), I8.qabs(a8))
    _cmp(qf.signum(af), I8.signum(a8))
    _cmp(qf.decide(af), I8.decide(a8))


def test_flip_exhaustive(qf):
    # flip's first two args are hard decisions (±1) by contract — SPC calls
    # it as flip(decide(..), parity, weak, |soft|) (polar_decoder.hh:123).
    # (At a=-128 int8 qmul would wrap while float wouldn't, but that input
    # cannot occur.)
    hard_vals = np.where(A >= 0, 1, -1).astype(np.int8)
    a8, c8 = jnp.asarray(hard_vals), jnp.asarray(B)
    for b in (-1, 1):
        b8 = jnp.full(A.shape, b, jnp.int8)
        # d == c half the time
        d8 = jnp.where(jnp.asarray(A) % 2 == 0, c8, c8 ^ 1)
        _cmp(
            qf.flip(a8.astype(qf.dtype), b8.astype(qf.dtype),
                    c8.astype(qf.dtype), d8.astype(qf.dtype)),
            I8.flip(a8, b8, c8, d8),
        )


def test_quant_matches_int8_quant(qf):
    xs = jnp.asarray(np.linspace(-300, 300, 4001, dtype=np.float32))
    from polar_tpu.ops import arith

    want = arith.quant(xs, jnp.int8)
    got = qf.quant(xs)
    _cmp(got, want)
