"""Hybrid Pallas encoder (interpret mode on CPU): bit-exact vs the XLA
encoders for whole-block codes, multi-block codes with XLA top stages,
non-rate-1/2 masks, and both systematic modes."""

import numpy as np
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.ops.pallas.encode_kernel import make_pallas_encoder


def _msg(code, batch, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (batch, code.K))).astype(np.int8))


@pytest.mark.parametrize("m,rate,block_level", [
    (7, 0.5, 7),     # whole-block: one kernel, no top stages
    (9, 0.5, 7),     # 4 blocks + 2 XLA top stages
    (10, 0.25, 8),   # low rate: all-frozen-heavy blocks, dedup path
    (8, 0.75, 6),    # high rate: all-info blocks skip the mask multiply
])
@pytest.mark.parametrize("systematic", [True, False])
def test_pallas_encoder_bit_exact(m, rate, block_level, systematic):
    code = pt.make_code(m, rate=rate)
    msg = _msg(code, 256, seed=m)
    enc = make_pallas_encoder(code, systematic=systematic,
                              frame_tile=128, block_level=block_level,
                              interpret=True)
    got = enc(msg)
    ref = (pt.encode_systematic if systematic else pt.encode)(code, msg)
    assert got.dtype == jnp.int8
    assert np.array_equal(np.asarray(got), np.asarray(ref).astype(np.int8))


def test_pallas_encoder_systematic_property():
    """Info bits must appear verbatim at non-frozen codeword positions
    (the reference's hard assert, testbench.cc:143-146)."""
    code = pt.make_code(8, rate=0.5)
    msg = _msg(code, 128, seed=42)
    cw = make_pallas_encoder(code, systematic=True, frame_tile=128,
                             block_level=6, interpret=True)(msg)
    info = np.flatnonzero(np.asarray(code.frozen) == 0)
    assert np.array_equal(np.asarray(cw)[:, info], np.asarray(msg))


def test_pallas_encoder_validates_batch():
    code = pt.make_code(6, rate=0.5)
    enc = make_pallas_encoder(code, frame_tile=128, interpret=True)
    with pytest.raises(ValueError):
        enc(_msg(code, 100))
