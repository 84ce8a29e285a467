"""Pallas megakernel tests (interpreter mode on CPU).

The kernel must be bit-exact with the XLA-path Fast-SSC decoder (which is
itself bit-exact with the reference int8 SIMD decoder — test_decoders).
Real-hardware validation runs in bench.py / verify on the TPU chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.decode.fastssc import make_fastssc_decoder
from polar_tpu.ops.pallas.decoder_kernel import make_pallas_decoder


@pytest.mark.parametrize("m", [3, 5, 7])
def test_pallas_matches_xla_int8(m):
    code = pt.make_code(m, rate=0.5)
    rng = np.random.default_rng(m)
    llr = jnp.asarray(rng.integers(-128, 128, (256, code.N)).astype(np.int8))
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    got = np.asarray(
        make_pallas_decoder(code, frame_tile=128, interpret=True)(llr)
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("m", [4, 8, 10])
@pytest.mark.parametrize("rate", [0.25, 0.5, 0.75])
def test_ssa_kernel_matches_scratch(m, rate):
    """The value-passing (scratch-free) kernel body must be bit-identical
    to the scratch-pyramid body, edge LLRs included."""
    code = pt.make_code(m, rate=rate)
    rng = np.random.default_rng(m + int(rate * 10))
    llr = np.concatenate([
        rng.integers(-128, 128, (64, code.N)),
        rng.choice(np.array([-128, -127, 0, 127]), (64, code.N)),
    ]).astype(np.int8)
    llr = jnp.asarray(llr)
    a = np.asarray(make_pallas_decoder(code, frame_tile=128,
                                       interpret=True)(llr))
    b = np.asarray(make_pallas_decoder(code, frame_tile=128, interpret=True,
                                       style="ssa")(llr))
    np.testing.assert_array_equal(a, b)


def test_pallas_padding():
    code = pt.make_code(4, rate=0.5)
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.integers(-128, 128, (100, code.N)).astype(np.int8))
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    got = np.asarray(make_pallas_decoder(code, frame_tile=128, interpret=True)(llr))
    assert got.shape == (100, code.K)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("rate", [0.25, 0.75])
def test_pallas_other_rates(rate):
    m = 6
    code = pt.make_code(m, K=int(rate * (1 << m)))
    rng = np.random.default_rng(int(rate * 10))
    llr = jnp.asarray(rng.integers(-128, 128, (128, code.N)).astype(np.int8))
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    got = np.asarray(make_pallas_decoder(code, frame_tile=128, interpret=True)(llr))
    np.testing.assert_array_equal(got, ref)


def test_pallas_bf16_compute_matches_int8():
    """bf16 compute carries int8 semantics exactly (interpret mode)."""
    import jax.numpy as jnp

    code = pt.make_code(6, rate=0.5)
    rng = np.random.default_rng(99)
    llr = jnp.asarray(rng.integers(-128, 128, (128, code.N)).astype(np.int8))
    ref = np.asarray(jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    got = np.asarray(
        make_pallas_decoder(code, frame_tile=128, compute_dtype=jnp.bfloat16,
                            interpret=True)(llr)
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_saturation_edges():
    """All-extreme LLRs exercise every clamp in the kernel."""
    code = pt.make_code(5, rate=0.5)
    for v in (-128, -127, 127, 0):
        llr = jnp.full((128, code.N), v, jnp.int8)
        ref = np.asarray(
            jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))(llr)
        )
        got = np.asarray(
            make_pallas_decoder(code, frame_tile=128, interpret=True)(llr)
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("m,rate", [(5, 0.5), (8, 0.5), (7, 0.25),
                                    (7, 0.75)])
@pytest.mark.parametrize("output", ["systematic", "codeword", "both"])
def test_pallas_fused_output_modes(m, rate, output):
    """The SSA kernel's fused codeword-estimate track must be bit-exact
    with the XLA path's re-encode epilogue — including zero-LLR ties,
    where the internal hard track and the re-encode genuinely differ
    (DESIGN.md §5's root-hard rejection). Zero-heavy LLRs force those
    ties."""
    code = pt.make_code(m, rate=rate)
    rng = np.random.default_rng(m * 10 + int(rate * 4))
    llr = np.concatenate([
        rng.integers(-128, 128, (64, code.N)),
        # zero-heavy rows: ~60% exact zeros → tie propagation everywhere
        rng.integers(-2, 3, (64, code.N)),
        rng.choice(np.array([-128, -127, 0, 127]), (64, code.N)),
    ]).astype(np.int8)
    llr = jnp.asarray(llr)
    ref = jax.jit(make_fastssc_decoder(code, output=output,
                                       output_dtype=jnp.int8))(llr)
    got = make_pallas_decoder(code, frame_tile=128, interpret=True,
                              style="ssa", output=output)(llr)
    if output == "both":
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    else:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_fused_output_requires_ssa():
    code = pt.make_code(5, rate=0.5)
    with pytest.raises(ValueError):
        make_pallas_decoder(code, output="codeword", style="scratch")
    with pytest.raises(ValueError):
        make_pallas_decoder(code, output="bogus")


def test_pallas_lane_major_entry():
    """Zero-transpose lane-major path must equal the (B, N) path."""
    import jax.numpy as jnp

    code = pt.make_code(5, rate=0.5)
    rng = np.random.default_rng(12)
    llr = jnp.asarray(rng.integers(-128, 128, (128, code.N)).astype(np.int8))
    dec = make_pallas_decoder(code, frame_tile=128, interpret=True)
    a = np.asarray(dec(llr))
    b = np.asarray(dec.lane_major(llr.T)).T
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        dec.lane_major(llr)  # wrong orientation
