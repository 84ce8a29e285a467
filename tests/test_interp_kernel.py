"""Interpreter-kernel tests (interpret mode on CPU).

The program-size-diet decoder (:mod:`polar_tpu.ops.pallas.interp_kernel`
— in-kernel step program + branch table, the TPU form of the reference's
byte-code dispatcher ``/root/reference/polar_decoder.hh:131-464``) must
be bit-exact with the XLA-path Fast-SSC decoder on every output track,
and its fused decode+count twin must match the unrolled decode+count
kernel's counters exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.decode.fastssc import make_fastssc_decoder
from polar_tpu.ops.pallas.interp_kernel import (make_interp_decode_count,
                                                make_interp_decoder)


def _edge_llrs(code, rows, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.concatenate([
        rng.integers(-128, 128, (rows // 2, code.N)),
        rng.choice(np.array([-128, -127, -1, 0, 1, 127]),
                   (rows - rows // 2, code.N)),
    ]).astype(np.int8))


@pytest.mark.parametrize("m,kl", [(6, 3), (8, 4), (10, 5)])
@pytest.mark.parametrize("rate", [0.25, 0.5, 0.75])
def test_interp_u_matches_xla(m, kl, rate):
    code = pt.make_code(m, rate=rate)
    llr = _edge_llrs(code, 128, seed=m * 7 + int(rate * 8))
    ref = np.asarray(jax.jit(
        make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    got = np.asarray(make_interp_decoder(
        code, subtree_level=kl, interpret=True)(llr))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("m,kl", [(7, 3), (9, 4)])
def test_interp_codeword_matches_xla(m, kl):
    code = pt.make_code(m, rate=0.5)
    llr = _edge_llrs(code, 128, seed=m)
    ref = np.asarray(jax.jit(make_fastssc_decoder(
        code, output="codeword", output_dtype=jnp.int8))(llr))
    got = np.asarray(make_interp_decoder(
        code, subtree_level=kl, output="codeword", interpret=True)(llr))
    np.testing.assert_array_equal(got, ref)


def test_interp_both_and_lane_major():
    code = pt.make_code(8, rate=0.5)
    llr = _edge_llrs(code, 128, seed=3)
    dec = make_interp_decoder(code, subtree_level=4, output="both",
                              interpret=True)
    u, cw = dec(llr)
    ref_u = np.asarray(jax.jit(
        make_fastssc_decoder(code, output_dtype=jnp.int8))(llr))
    ref_cw = np.asarray(jax.jit(make_fastssc_decoder(
        code, output="codeword", output_dtype=jnp.int8))(llr))
    np.testing.assert_array_equal(np.asarray(u), ref_u)
    np.testing.assert_array_equal(np.asarray(cw), ref_cw)
    u_t, cw_t = dec.lane_major(llr.T)
    np.testing.assert_array_equal(np.asarray(u_t).T, ref_u)
    np.testing.assert_array_equal(np.asarray(cw_t).T, ref_cw)


def test_interp_subtree_level_invariance():
    """The step-program granularity must not change results — any
    subtree_level split is the same math."""
    code = pt.make_code(9, rate=0.5)
    llr = _edge_llrs(code, 128, seed=11)
    outs = [np.asarray(make_interp_decoder(
        code, subtree_level=kl, output="codeword", interpret=True)(llr))
        for kl in (2, 4, 6, 9)]
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])


def test_interp_storage_f32_matches_int8():
    code = pt.make_code(8, rate=0.5)
    llr = _edge_llrs(code, 128, seed=5)
    a = np.asarray(make_interp_decoder(
        code, subtree_level=4, storage_dtype=jnp.int8, interpret=True)(llr))
    b = np.asarray(make_interp_decoder(
        code, subtree_level=4, storage_dtype=jnp.float32,
        interpret=True)(llr))
    np.testing.assert_array_equal(a, b)


def test_interp_program_is_small():
    """The whole point: program size must be O(distinct bodies), far
    below the tree size. At m=10 rate 1/2 with level-5 bodies the
    unrolled tree has ~hundreds of nodes; the branch table must stay
    in the dozens."""
    code = pt.make_code(10, rate=0.5)
    dec = make_interp_decoder(code, subtree_level=5, interpret=True)
    assert dec.program_steps >= 32          # real program, not a stub
    assert dec.program_branches < dec.program_steps
    assert dec.program_branches < 64


def test_interp_decode_count_matches_unrolled():
    """Fused decode+count counters must equal the unrolled decode+count
    kernel's on identical (llr, cw) inputs — same counter math
    (testbench.cc:185-192), different decoder body shape."""
    from polar_tpu.ops.pallas.step_kernel import make_pallas_decode_count

    code = pt.make_code(8, rate=0.5)
    rng = np.random.default_rng(17)
    # a real (noisy) channel pair: encode a message, perturb the LLRs
    msg = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (128, code.K))).astype(np.int8))
    cw = pt.encode_systematic(code, msg)
    llr = jnp.asarray(np.clip(
        np.asarray(cw, np.int32) * 24
        + rng.integers(-64, 65, (128, code.N)), -128, 127).astype(np.int8))
    llr_t, cw_t = llr.T, cw.astype(jnp.int8).T
    ref = make_pallas_decode_count(code, frame_tile=128,
                                   interpret=True)(llr_t, cw_t)
    got = make_interp_decode_count(code, subtree_level=4, frame_tile=128,
                                   interpret=True)(llr_t, cw_t)
    assert set(got) == set(ref)
    for k in ref:
        assert int(got[k]) == int(ref[k]), k
    # and the counters are non-trivial at this noise level
    assert int(got["awgn_errors"]) > 0


@pytest.mark.parametrize("output", ["u", "codeword"])
def test_interp_hybrid_matches_ssa_hybrid(output):
    """kernel_style='interp' subtree kernels inside the hybrid decoder
    must be bit-identical to the SSA subtree kernels (and therefore to
    the reference) on every output track."""
    code = pt.make_code(9, rate=0.5)
    llr = _edge_llrs(code, 128, seed=23)
    kw = dict(output=output, output_dtype=jnp.int8, kernel_level=6,
              kernel_frame_tile=128, kernel_interpret=True)
    ref = np.asarray(make_fastssc_decoder(code, kernel_style="ssa",
                                          **kw)(llr))
    got = np.asarray(make_fastssc_decoder(code, kernel_style="interp",
                                          **kw)(llr))
    np.testing.assert_array_equal(got, ref)


def test_interp_hybrid_lane_major():
    code = pt.make_code(9, rate=0.5)
    llr = _edge_llrs(code, 128, seed=29)
    kw = dict(output="codeword", output_dtype=jnp.int8, kernel_level=6,
              kernel_frame_tile=128, kernel_interpret=True)
    ref = np.asarray(make_fastssc_decoder(code, kernel_style="ssa",
                                          **kw)(llr))
    got_t = make_fastssc_decoder(code, kernel_style="interp",
                                 **kw).lane_major(llr.T)
    np.testing.assert_array_equal(np.asarray(got_t).T, ref)


def test_interp_subtree_rejects_fuse():
    code = pt.make_code(8, rate=0.5)
    with pytest.raises(ValueError):
        make_fastssc_decoder(code, kernel_level=5, kernel_style="interp",
                             kernel_fuse=True)


def test_interp_count_step_path_matches_default(monkeypatch):
    """make_step_body's interp decode+count branch (large systematic
    levels whose unrolled decode_count can't compile) must count
    bit-identically to the default decode_count path on the same key
    in bits mode."""
    import polar_tpu.ber as ber

    code = pt.make_code(9, rate=0.5)
    monkeypatch.setattr(ber, "_FRONT_WHOLE_MAX_LEVEL", 5)
    default = ber.make_step_body(code, rng="pallas-bits",
                                 rng_interpret=True)
    monkeypatch.setattr(ber, "_DECODE_COUNT_MAX_LEVEL", 5)
    monkeypatch.setattr(ber, "_INTERP_COUNT_LEVELS", {9: (5, None)})
    interp = ber.make_step_body(code, rng="pallas-bits",
                                rng_interpret=True)
    for k, snr in [(0, 14.0), (3, -1.0)]:
        a = {n: int(v)
             for n, v in default(jax.random.PRNGKey(k), snr, 256).items()}
        b = {n: int(v)
             for n, v in interp(jax.random.PRNGKey(k), snr, 256).items()}
        assert a == b, (snr, a, b)


def test_interp_oracle_parity():
    """DIRECT oracle parity for the interpreter kernel (not just
    transitively via the XLA decoder): bit-exact int8 u output vs the
    reference SIMD decoder on random full-range LLRs."""
    import sys
    sys.path.insert(0, "tests")
    import oracle
    if not oracle.have_reference():
        pytest.skip("/root/reference not mounted")
    m = 9
    rng = np.random.default_rng(31)
    code = pt.make_code(m, rate=0.5)
    w = oracle.width()
    llr = rng.integers(-128, 128, (w, code.N)).astype(np.int8)
    # pad to the frame tile, slice back (the decoder does it internally)
    ref = oracle.decode(m, code.frozen, llr)
    got = np.asarray(make_interp_decoder(
        code, subtree_level=5, interpret=True)(jnp.asarray(llr)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("output", ["u", "codeword"])
def test_interp_chain_chunking(monkeypatch, output):
    """Chain ops process row chunks at the large-N frontier (where a
    whole-level f's live vectors would spill registers — receipt
    m16-interp-decodecount-kl8). Force the chunk path at a small code
    by shrinking the cap: every chain level then runs multi-chunk, and
    the result must stay bit-identical."""
    from polar_tpu.ops.pallas import interp_kernel

    monkeypatch.setattr(interp_kernel, "_CHAIN_CHUNK_ROWS", 64)
    code = pt.make_code(9, rate=0.5)
    llr = _edge_llrs(code, 128, seed=99)
    ref = np.asarray(jax.jit(make_fastssc_decoder(
        code, output=output, output_dtype=jnp.int8))(llr))
    got = np.asarray(make_interp_decoder(
        code, subtree_level=4, output=output, interpret=True)(llr))
    np.testing.assert_array_equal(got, ref)
