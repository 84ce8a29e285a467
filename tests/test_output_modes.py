"""Decoder output modes and compute modes: exactness guarantees.

* root-hard identity: ``codeword`` output == re-encode of ``u`` output
* ``systematic`` output == the testbench's re-encode + info gather
* ``qfloat`` (bf16/f32) compute is bit-identical to int8 compute
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.decode.fastssc import make_fastssc_decoder


CODE = pt.make_code(8, rate=0.5)


def rand_llrs(seed, batch, code=CODE):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(-128, 128, (batch, code.N)).astype(np.int8))


def test_codeword_output_is_reencoded_u():
    llr = rand_llrs(0, 16)
    dec_both = jax.jit(make_fastssc_decoder(CODE, output="both"))
    u, cw = dec_both(llr)
    reenc = pt.encode(CODE, u)
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(reenc))


def test_systematic_output_matches_reencode_gather():
    llr = rand_llrs(1, 16)
    u = jax.jit(make_fastssc_decoder(CODE, output="u"))(llr)
    sys_direct = jax.jit(make_fastssc_decoder(CODE, output="systematic"))(llr)
    sys_ref = pt.extract_systematic(CODE, u)
    np.testing.assert_array_equal(np.asarray(sys_direct), np.asarray(sys_ref))


@pytest.mark.parametrize("compute", ["qfloat", "qfloat-f32"])
@pytest.mark.parametrize("output", ["u", "systematic"])
def test_qfloat_bitexact_with_int8(compute, output):
    llr = rand_llrs(2, 32)
    a = jax.jit(make_fastssc_decoder(CODE, output=output))(llr)
    b = jax.jit(
        make_fastssc_decoder(CODE, output=output, compute=compute,
                             output_dtype=jnp.int8)
    )(llr)
    assert np.asarray(b).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qfloat_parity_vs_oracle():
    import oracle

    if not oracle.have_reference():
        pytest.skip("/root/reference not mounted")
    m = 7
    code = pt.make_code(m, rate=0.5)
    rng = np.random.default_rng(5)
    llr = rng.integers(-128, 128, (oracle.width(), code.N)).astype(np.int8)
    ref = oracle.decode(m, code.frozen, llr)
    ours = np.asarray(
        jax.jit(make_fastssc_decoder(code, compute="qfloat",
                                     output_dtype=jnp.int8))(jnp.asarray(llr))
    )
    np.testing.assert_array_equal(ours, ref)


def test_step_systematic_matches_old_reencode_path():
    """The systematic fast path in the BER step must count exactly the
    same errors as the explicit u-decode + re-encode + gather chain."""
    key = jax.random.PRNGKey(9)
    fast = pt.make_step(CODE, systematic=True)
    out_fast = jax.device_get(fast(key, 0.0, 256))

    dec_u = make_fastssc_decoder(CODE, output="u")

    def slow_decoder(llrs):
        return pt.extract_systematic(CODE, dec_u(llrs))

    slow = pt.make_step(CODE, systematic=True, decoder=slow_decoder)
    out_slow = jax.device_get(slow(key, 0.0, 256))
    for k in out_fast:
        assert int(out_fast[k]) == int(out_slow[k]), k


def test_campaign_with_qfloat_compute():
    res = pt.run_campaign(
        CODE, batch=256, max_frames_per_point=512, target_bit_errors=100,
        snr_range=(4.0, 10.0), snr_step=1.0, stop_after_clean=2,
        measure_throughput=False, compute="qfloat",
    )
    assert res.points[-1].bit_errors == 0


def test_invalid_output_mode():
    with pytest.raises(ValueError):
        make_fastssc_decoder(CODE, output="bogus")
