"""Channel model tests: sigma/Eb/N0 formulas and LLR quantization."""

import math

import numpy as np
import jax
import jax.numpy as jnp

import polar_tpu as pt


def test_noise_sigma_formula():
    # testbench.cc:114 — sigma = sqrt(1 / (2 * 10^(SNR/10)))
    assert math.isclose(pt.noise_sigma(0.0), math.sqrt(0.5))
    assert math.isclose(pt.noise_sigma(10.0), math.sqrt(0.05))


def test_ebn0_formula():
    # testbench.cc:203-206 at rate 1/2 BPSK: Eb/N0 = Es/N0 + 10log10(2)
    assert math.isclose(pt.ebn0_db(0.0, 0.5), 10 * math.log10(2), rel_tol=1e-12)


def test_awgn_llrs_statistics():
    key = jax.random.PRNGKey(0)
    cw = jnp.ones((512, 64), jnp.int8)
    llr = pt.awgn_llrs(key, cw, snr_db=20.0)
    assert llr.dtype == jnp.int8
    # at 20 dB the LLR scale 2/sigma^2 = 400 >> 127: everything saturates +127
    assert int(jnp.min(llr)) == 127


def test_awgn_llrs_float_dtype():
    key = jax.random.PRNGKey(1)
    cw = jnp.ones((64, 32), jnp.float32)
    llr = pt.awgn_llrs(key, cw, snr_db=0.0, dtype=jnp.float32)
    assert llr.dtype == jnp.float32
    # mean LLR for +1 symbols is 2/sigma^2 = 4.0 at 0 dB
    assert abs(float(jnp.mean(llr)) - 4.0) < 0.5


def test_awgn_deterministic_in_key():
    key = jax.random.PRNGKey(7)
    cw = jnp.ones((16, 16), jnp.int8)
    a = pt.awgn_llrs(key, cw, 1.0)
    b = pt.awgn_llrs(key, cw, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
