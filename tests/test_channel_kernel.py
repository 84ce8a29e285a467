"""Elementwise PRNG kernels (interpret mode on CPU).

Exactness strategy mirrors test_step_kernel: the ``bits`` modes feed
externally-drawn u32 bits through the in-kernel math, which must equal
the same formulas computed directly in XLA — including across grid
tiles (shapes larger than one block). The native mode differs only in
where the bits come from (TPU hardware PRNG; statistical receipts live
in results/throughput_receipts_r2.txt).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.ber import make_step_body
from polar_tpu.ops.pallas.channel_kernel import (
    make_pallas_awgn, make_pallas_symbols, pick_blocks)
from polar_tpu.ops.pallas.step_kernel import _bits_to_unit, _sincos_2pi


def _ref_normals(b1, b2):
    # the shared quadrant-reduced cosine, NOT jnp.cos — the kernels use
    # it for speed (builtin trig is ~26 Mosaic ops) and the bits-mode
    # exactness contract is "identical math inside and outside the
    # kernel"; test_sincos_2pi_accuracy pins it against the builtin
    u1, u2 = _bits_to_unit(b1), _bits_to_unit(b2)
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
    return r * _sincos_2pi(u2)[0]


def test_pick_blocks():
    assert pick_blocks(4096, 8192) == (256, 512)
    assert pick_blocks(96, 128) == (32, 128)
    assert pick_blocks(100, 128) is None     # rows not a multiple of 32
    assert pick_blocks(256, 100) is None     # cols not a multiple of 128


def test_symbols_bits_match_formula_across_tiles():
    bits = jax.random.bits(jax.random.PRNGKey(0), (320, 640), jnp.uint32)
    got = make_pallas_symbols(interpret=True, prng="bits")(bits)
    want = (1 - 2 * (np.asarray(bits) & 1)).astype(np.int8)
    assert got.dtype == jnp.int8
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("snr_db", [-1.0, 3.0])
def test_awgn_bits_match_formula_across_tiles(snr_db):
    rng = np.random.default_rng(1)
    cw = jnp.asarray((1 - 2 * rng.integers(0, 2, (96, 256))).astype(np.int8))
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    b1 = jax.random.bits(k1, cw.shape, jnp.uint32)
    b2 = jax.random.bits(k2, cw.shape, jnp.uint32)
    got = make_pallas_awgn(interpret=True, prng="bits")(b1, b2, cw, snr_db)
    sigma2 = 0.5 * 10.0 ** (-jnp.float32(snr_db) / 10.0)
    y = cw.astype(jnp.float32) + jnp.sqrt(sigma2) * _ref_normals(b1, b2)
    want = jnp.clip(jnp.rint((2.0 / sigma2) * y), -128, 127).astype(jnp.int8)
    assert got.dtype == jnp.int8
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_cosine_box_muller_distribution():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    b1 = jax.random.bits(k1, (1 << 9, 512), jnp.uint32)
    b2 = jax.random.bits(k2, (1 << 9, 512), jnp.uint32)
    n = np.asarray(_ref_normals(b1, b2)).ravel()
    assert abs(n.mean()) < 0.01
    assert abs(n.std() - 1.0) < 0.01
    assert 0.001 < np.mean(np.abs(n) > 3.0) < 0.006
    assert abs(np.mean(n**4) - 3.0) < 0.15


def test_step_body_pallas_bits_statistics_track_threefry():
    """Full Monte-Carlo step with kernel-RNG draws: same-SNR BER must
    agree statistically with the threefry chain (different streams)."""
    code = pt.make_code(9, rate=0.5)   # N=512, K=256: tiles cleanly
    kb = make_step_body(code, rng="pallas-bits", rng_interpret=True)
    xla = make_step_body(code)
    snr_db, batch, rounds = 0.0, 512, 4
    tot_k = tot_x = 0
    key = jax.random.PRNGKey(11)
    for _ in range(rounds):
        key, k1, k2 = jax.random.split(key, 3)
        tot_k += int(kb(k1, snr_db, batch)["uncorrected_errors"])
        tot_x += int(xla(k2, snr_db, batch)["uncorrected_errors"])
    bits_total = rounds * batch * code.K
    ber_k, ber_x = tot_k / bits_total, tot_x / bits_total
    assert ber_k > 0 and ber_x > 0
    assert abs(ber_k - ber_x) < 0.3 * max(ber_k, ber_x)


def test_step_body_pallas_bits_falls_back_on_bad_shapes():
    """Batches/shapes the kernels can't tile must fall back to the
    threefry path at trace time and still count correctly."""
    code = pt.make_code(5, rate=0.5)   # N=32: cols not a multiple of 128
    body = make_step_body(code, rng="pallas-bits", rng_interpret=True)
    out = body(jax.random.PRNGKey(0), 15.0, 64)
    assert int(out["uncorrected_errors"]) == 0


def test_step_body_rejects_unknown_rng():
    code = pt.make_code(5, rate=0.5)
    with pytest.raises(ValueError):
        make_step_body(code, rng="bogus")
