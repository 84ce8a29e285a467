"""Fused Monte-Carlo step kernel (interpret mode on CPU).

Exactness strategy: the ``inject`` mode feeds the SAME message symbols
and normals to the kernel and to a reference XLA chain built from the
tested-and-bit-exact pieces (encode_systematic, awgn math, fastssc
systematic decode, bool-domain counters) — every counter must match
exactly, f32 op order included. The ``bits`` mode is then proven equal
to inject mode fed with the same bit-derived values, and the bit→
uniform/normal/symbol helpers are validated directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import polar_tpu as pt
from polar_tpu.decode.fastssc import make_fastssc_decoder
from polar_tpu.ops.pallas.step_kernel import (
    _bits_to_normals, _bits_to_sym, _bits_to_unit, make_pallas_step)


def _reference_counters(code, msg_sym_t, normals_t, snr_db,
                        systematic=True):
    """The XLA-chain counters on identical inputs, matching
    polar_tpu.ber.make_step_body's math (testbench.cc:185-192)."""
    info = code.info_indices
    message = jnp.asarray(msg_sym_t).T[:, info].astype(jnp.int8)
    enc = pt.encode_systematic if systematic else pt.encode
    codeword = enc(code, message)
    sigma2 = 0.5 * 10.0 ** (-jnp.float32(snr_db) / 10.0)
    y = codeword.astype(jnp.float32) + jnp.sqrt(sigma2) * jnp.asarray(normals_t).T
    llrs = jnp.clip(jnp.rint((2.0 / sigma2) * y), -128, 127).astype(jnp.int8)
    decoded = jax.jit(make_fastssc_decoder(
        code, output="systematic" if systematic else "u",
        output_dtype=jnp.int8))(llrs)
    zero_d = decoded == 0
    errs = zero_d | ((decoded < 0) != (message < 0))
    return {
        "uncorrected_errors": int(jnp.sum(errs, dtype=jnp.int32)),
        "frame_errors": int(jnp.sum(jnp.any(errs, axis=-1), dtype=jnp.int32)),
        "ambiguity_erasures": int(jnp.sum(zero_d, dtype=jnp.int32)),
        "awgn_errors": int(jnp.sum(
            (llrs != 0) & ((llrs < 0) != (codeword < 0)), dtype=jnp.int32)),
        "quantization_erasures": int(jnp.sum(llrs == 0, dtype=jnp.int32)),
    }


@pytest.mark.parametrize("m,rate", [(5, 0.5), (8, 0.5), (7, 0.25)])
@pytest.mark.parametrize("snr_db", [-2.0, 1.0])
def test_inject_counters_match_xla_chain_exactly(m, rate, snr_db):
    code = pt.make_code(m, rate=rate)
    rng = np.random.default_rng(m * 7 + int(snr_db))
    batch = 256
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, batch))).astype(np.int8))
    normals_t = jnp.asarray(rng.standard_normal((code.N, batch), np.float32))
    step = make_pallas_step(code, frame_tile=128, interpret=True,
                            prng="inject")
    got = {k: int(v) for k, v in step(msg_t, normals_t, snr_db).items()}
    ref = _reference_counters(code, msg_t, normals_t, snr_db)
    assert got == ref
    # the point is a noisy one: counters must actually be non-trivial
    if snr_db < 0:
        assert got["awgn_errors"] > 0


@pytest.mark.parametrize("m,rate", [(5, 0.5), (8, 0.5), (7, 0.25)])
@pytest.mark.parametrize("snr_db", [-2.0, 1.0])
def test_inject_counters_match_xla_chain_nonsystematic(m, rate, snr_db):
    """Non-systematic mode: u-domain error counting against the drawn
    message (testbench.cc:147-149) must match the XLA chain exactly —
    this pins the kernel's u-domain leaf track (collect_u) end to end."""
    code = pt.make_code(m, rate=rate)
    rng = np.random.default_rng(m * 13 + int(snr_db))
    batch = 256
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, batch))).astype(np.int8))
    normals_t = jnp.asarray(rng.standard_normal((code.N, batch), np.float32))
    step = make_pallas_step(code, frame_tile=128, interpret=True,
                            prng="inject", systematic=False)
    got = {k: int(v) for k, v in step(msg_t, normals_t, snr_db).items()}
    ref = _reference_counters(code, msg_t, normals_t, snr_db,
                              systematic=False)
    assert got == ref
    if snr_db < 0:
        # the noisy point must be non-trivial (a strong code may still
        # correct every frame — e.g. rate 1/4 at -2 dB — so only the
        # channel-error counter is guaranteed non-zero)
        assert got["awgn_errors"] > 0


def test_nonsystematic_bits_mode_equals_inject():
    code = pt.make_code(7, rate=0.5)
    key = jax.random.PRNGKey(8)
    batch, snr_db = 256, -1.0
    bits = jax.random.bits(key, (2 * code.N, batch), jnp.uint32)
    a = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="bits", systematic=False)(key, snr_db, batch)
    b = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="inject", systematic=False)(
        _bits_to_sym(bits[code.N:]), _bits_to_normals(bits[:code.N]), snr_db)
    assert {k: int(v) for k, v in a.items()} == \
        {k: int(v) for k, v in b.items()}


def test_inject_low_noise_perfect_recovery():
    code = pt.make_code(6, rate=0.5)
    rng = np.random.default_rng(0)
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, 128))).astype(np.int8))
    normals_t = jnp.asarray(rng.standard_normal((code.N, 128), np.float32))
    out = make_pallas_step(code, frame_tile=128, interpret=True,
                           prng="inject")(msg_t, normals_t, 15.0)
    assert int(out["uncorrected_errors"]) == 0
    assert int(out["frame_errors"]) == 0
    assert int(out["awgn_errors"]) == 0


def test_bits_mode_equals_inject_of_derived_values():
    """bits mode == inject mode fed the bit-derived symbols/normals —
    proves the in-kernel derivation path end-to-end."""
    code = pt.make_code(7, rate=0.5)
    key = jax.random.PRNGKey(3)
    batch, snr_db = 256, -1.0
    bits = jax.random.bits(key, (2 * code.N, batch), jnp.uint32)
    a = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="bits")(key, snr_db, batch)
    b = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="inject")(
        _bits_to_sym(bits[code.N:]), _bits_to_normals(bits[:code.N]), snr_db)
    assert {k: int(v) for k, v in a.items()} == \
        {k: int(v) for k, v in b.items()}


def test_step_kernel_wide_counters_match_narrow():
    """The wide (f32) counter-compare variant — what systematic step
    kernels compile at m >= 13, where Mosaic rejects int8 compares over
    the larger concat layouts — must count bit-identically to the
    narrow form on the same bit streams."""
    code = pt.make_code(8, rate=0.5)
    key = jax.random.PRNGKey(11)
    a = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="bits", wide=False)(key, -1.0, 256)
    b = make_pallas_step(code, frame_tile=128, interpret=True,
                         prng="bits", wide=True)(key, -1.0, 256)
    assert {k: int(v) for k, v in a.items()} == \
        {k: int(v) for k, v in b.items()}


def test_bits_to_unit_range_and_mean():
    bits = jax.random.bits(jax.random.PRNGKey(1), (1 << 18,), jnp.uint32)
    u = np.asarray(_bits_to_unit(bits))
    assert u.min() > 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1 / 12) < 0.002


def test_bits_to_normals_distribution():
    bits = jax.random.bits(jax.random.PRNGKey(2), (1 << 10, 256), jnp.uint32)
    n = np.asarray(_bits_to_normals(bits)).ravel()
    assert abs(n.mean()) < 0.01
    assert abs(n.std() - 1.0) < 0.01
    # tails exist (Box-Muller, not a CLT approximation): P(|n|>3) ≈ 0.27%
    frac3 = np.mean(np.abs(n) > 3.0)
    assert 0.001 < frac3 < 0.006
    # fourth moment of a standard normal is 3 (kurtosis check)
    assert abs(np.mean(n**4) - 3.0) < 0.15


def test_sincos_2pi_accuracy():
    """The quadrant-reduced polynomial sincos must track the builtins to
    f32-roundoff over the full (0, 1) argument range, including the
    quadrant boundaries (k = rint(4u) seams at u = 1/8, 3/8, 5/8, 7/8)."""
    from polar_tpu.ops.pallas.step_kernel import _sincos_2pi

    u = np.concatenate([
        np.linspace(1e-7, 1.0 - 1e-7, 200001, dtype=np.float32),
        np.float32([0.125, 0.375, 0.625, 0.875]) + np.float32(2.0 ** -24),
        np.float32([0.125, 0.375, 0.625, 0.875]) - np.float32(2.0 ** -24),
    ])
    c, s = _sincos_2pi(jnp.asarray(u))
    theta = 2.0 * np.pi * u.astype(np.float64)
    assert np.max(np.abs(np.asarray(c, np.float64) - np.cos(theta))) < 3e-7
    assert np.max(np.abs(np.asarray(s, np.float64) - np.sin(theta))) < 3e-7


def test_bits_to_sym_balance():
    bits = jax.random.bits(jax.random.PRNGKey(4), (1 << 18,), jnp.uint32)
    s = np.asarray(_bits_to_sym(bits))
    assert set(np.unique(s)) == {-1.0, 1.0}
    assert abs(s.mean()) < 0.01


def test_step_kernel_validation_errors():
    code = pt.make_code(5, rate=0.5)
    with pytest.raises(ValueError):
        make_pallas_step(code, prng="bogus")
    step = make_pallas_step(code, frame_tile=128, interpret=True,
                            prng="bits")
    with pytest.raises(ValueError):
        step(jax.random.PRNGKey(0), 0.0, 100)  # not a tile multiple


def test_make_step_fused_auto_stays_xla_on_cpu():
    """fused="auto" must not pick the (TPU-only) kernel on CPU; the step
    still works end-to-end."""
    code = pt.make_code(5, rate=0.5)
    step = pt.make_step(code, systematic=True)  # fused="auto"
    out = jax.device_get(step(jax.random.PRNGKey(0), 10.0, 64))
    assert int(out["uncorrected_errors"]) == 0


def test_make_step_fused_rejects_unsupported_modes():
    code = pt.make_code(5, rate=0.5)
    with pytest.raises(ValueError):
        pt.make_step(code, compute="qfloat", fused=True)
    with pytest.raises(ValueError):
        pt.make_step(code, dtype=jnp.float32, fused=True)


def test_bits_step_statistics_track_xla_step():
    """Same-SNR BER from the fused step and the XLA step must agree
    statistically (different RNG streams; tolerance from binomial CI)."""
    code = pt.make_code(6, rate=0.5)
    snr_db, batch, rounds = 0.0, 512, 4
    fused = make_pallas_step(code, frame_tile=128, interpret=True,
                             prng="bits")
    xla = pt.make_step(code, systematic=True)
    tot_f = tot_x = 0
    key = jax.random.PRNGKey(11)
    for _ in range(rounds):
        key, k1, k2 = jax.random.split(key, 3)
        tot_f += int(fused(k1, snr_db, batch)["uncorrected_errors"])
        tot_x += int(xla(k2, snr_db, batch)["uncorrected_errors"])
    bits_total = rounds * batch * code.K
    ber_f, ber_x = tot_f / bits_total, tot_x / bits_total
    assert ber_f > 0 and ber_x > 0
    # ~65k info bits/side; BER ~1e-2 → σ_rel ≈ 4%; allow 3.5x combined
    assert abs(ber_f - ber_x) < 0.3 * max(ber_f, ber_x)


def test_front_kernel_inject_matches_xla_chain_exactly():
    """make_pallas_front's (llr, cw) must equal the XLA chain's outputs
    bit-for-bit on identical message symbols and normals."""
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front

    code = pt.make_code(8, rate=0.5)
    rng = np.random.default_rng(9)
    batch, snr_db = 256, -1.0
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, batch))).astype(np.int8))
    normals_t = jnp.asarray(rng.standard_normal((code.N, batch), np.float32))
    front = make_pallas_front(code, frame_tile=128, interpret=True,
                              prng="inject")
    llr_t, cw_t = front(msg_t, normals_t, snr_db)
    # reference chain on the same inputs (message = info rows of msg_t)
    info = code.info_indices
    message = msg_t.T[:, info].astype(jnp.int8)
    cw_ref = pt.encode_systematic(code, message)
    sigma2 = 0.5 * 10.0 ** (-jnp.float32(snr_db) / 10.0)
    y = cw_ref.astype(jnp.float32) + jnp.sqrt(sigma2) * normals_t.T
    llr_ref = jnp.clip(jnp.rint((2.0 / sigma2) * y), -128, 127)
    assert np.array_equal(np.asarray(cw_t).T, np.asarray(cw_ref))
    assert np.array_equal(np.asarray(llr_t).T.astype(np.int32),
                          np.asarray(llr_ref).astype(np.int32))


def test_front_path_counters_match_reference_chain():
    """The full front path (front kernel + lane_major decode + cw-domain
    counters) must count exactly like the standard XLA chain given the
    same bit streams — proven by keying both identically in bits mode
    is impossible (different streams), so instead: drive step_front's
    counter math on injected values vs _reference_counters."""
    from polar_tpu.ber import make_step_body

    code = pt.make_code(7, rate=0.5)
    body = make_step_body(code, rng="pallas-bits", rng_interpret=True)
    out = body(jax.random.PRNGKey(0), 14.0, 256)
    assert int(out["uncorrected_errors"]) == 0
    assert int(out["frame_errors"]) == 0
    noisy = body(jax.random.PRNGKey(1), -1.5, 256)
    assert int(noisy["awgn_errors"]) > 0
    assert int(noisy["uncorrected_errors"]) > 0


def test_decode_count_kernel_matches_xla_counter_math():
    """make_pallas_decode_count (decode + counters fused in one kernel)
    must produce the exact counters of lane_major decode + the XLA
    bool-domain counter math on identical (llr_t, cw_t) inputs —
    including zero LLRs and saturation values."""
    from polar_tpu.ops.pallas.decoder_kernel import make_pallas_decoder
    from polar_tpu.ops.pallas.step_kernel import make_pallas_decode_count

    code = pt.make_code(8, rate=0.5)
    rng = np.random.default_rng(17)
    batch = 256
    llr_t = jnp.asarray(rng.integers(-128, 128, (code.N, batch), np.int64)
                        .astype(np.int8))
    # a valid random codeword batch (±1), transposed to element-major
    msg = jnp.asarray((1 - 2 * rng.integers(0, 2, (batch, code.K)))
                      .astype(np.int8))
    cw_t = pt.encode_systematic(code, msg).T
    count = make_pallas_decode_count(code, frame_tile=128, interpret=True)
    got = {k: int(v) for k, v in count(llr_t, cw_t).items()}
    # the wide (f32-compare) variant — what m>=13 codes compile on TPU
    # (Mosaic rejects int8 compares on the larger concat layouts) — must
    # count identically
    wide = make_pallas_decode_count(code, frame_tile=128, interpret=True,
                                    wide=True)
    got_wide = {k: int(v) for k, v in wide(llr_t, cw_t).items()}
    assert got_wide == got
    dec = make_pallas_decoder(code, frame_tile=128, style="ssa",
                              output="codeword", output_dtype=jnp.int8,
                              interpret=True)
    cw_hat_t = dec.lane_major(llr_t)[1]
    info_rows = jnp.asarray(code.frozen == 0).reshape(code.N, 1)
    zero_d = (cw_hat_t == 0) & info_rows
    err = (cw_hat_t != cw_t) & info_rows
    ref = {
        "uncorrected_errors": int(jnp.sum(err, dtype=jnp.int32)),
        "frame_errors": int(jnp.sum(jnp.any(err, axis=0), dtype=jnp.int32)),
        "ambiguity_erasures": int(jnp.sum(zero_d, dtype=jnp.int32)),
        "awgn_errors": int(jnp.sum(
            (llr_t != 0) & ((llr_t < 0) != (cw_t < 0)), dtype=jnp.int32)),
        "quantization_erasures": int(jnp.sum(llr_t == 0, dtype=jnp.int32)),
    }
    assert got == ref
    assert got["quantization_erasures"] > 0  # full-range draw hits zeros
    with pytest.raises(ValueError):
        count(llr_t, cw_t[:, :128])
    with pytest.raises(ValueError):
        count(llr_t[:, :100], cw_t[:, :100])


def test_count_kernel_matches_xla_counter_math():
    """make_pallas_count (the counter epilogue alone, one VMEM pass)
    must produce the exact counters of the XLA bool-domain block on
    identical (llr_t, cw_t, hat_t) inputs — including zero LLRs, a
    decoded-zero (tie) track and saturation values."""
    from polar_tpu.ops.pallas.step_kernel import make_pallas_count

    code = pt.make_code(8, rate=0.5)
    rng = np.random.default_rng(23)
    batch = 256
    llr_t = jnp.asarray(rng.integers(-128, 128, (code.N, batch), np.int64)
                        .astype(np.int8))
    msg = jnp.asarray((1 - 2 * rng.integers(0, 2, (batch, code.K)))
                      .astype(np.int8))
    cw_t = pt.encode_systematic(code, msg).T
    # a synthetic hat track with all three values {-1, 0, +1} present
    hat_t = jnp.asarray(rng.integers(-1, 2, (code.N, batch), np.int64)
                        .astype(np.int8))
    count = make_pallas_count(code, frame_tile=128, interpret=True)
    got = {k: int(v) for k, v in count(llr_t, cw_t, hat_t).items()}
    info_rows = jnp.asarray(code.frozen == 0).reshape(code.N, 1)
    zero_d = (hat_t == 0) & info_rows
    err = (hat_t != cw_t) & info_rows
    ref = {
        "uncorrected_errors": int(jnp.sum(err, dtype=jnp.int32)),
        "frame_errors": int(jnp.sum(jnp.any(err, axis=0), dtype=jnp.int32)),
        "ambiguity_erasures": int(jnp.sum(zero_d, dtype=jnp.int32)),
        "awgn_errors": int(jnp.sum(
            (llr_t != 0) & ((llr_t < 0) != (cw_t < 0)), dtype=jnp.int32)),
        "quantization_erasures": int(jnp.sum(llr_t == 0, dtype=jnp.int32)),
    }
    assert got == ref
    assert got["ambiguity_erasures"] > 0
    with pytest.raises(ValueError):
        count(llr_t, cw_t, hat_t[:, :128])


def test_count_kernel_step_body_equality():
    """A campaign step routed through the count kernel must return the
    exact counters of the default XLA-epilogue step on the same key
    (the _COUNT_KERNEL_LEVELS gate flipped by hand)."""
    import polar_tpu.ber as ber

    code = pt.make_code(8, rate=0.5)
    key = jax.random.PRNGKey(3)
    # push m8 onto the split decode + counter-epilogue path (the real
    # count-kernel territory, m >= 15, is uncompilable in CPU interpret).
    # BOTH gates must move: with only _DECODE_COUNT_MAX_LEVEL lowered,
    # m8 still takes the whole-front branch (<= _FRONT_WHOLE_MAX_LEVEL),
    # whose decode_count is built unconditionally — the count kernel
    # would never be constructed and the A/B would compare the fused
    # kernel against itself (ADVICE r4).
    orig_fw = ber._FRONT_WHOLE_MAX_LEVEL
    orig_dc = ber._DECODE_COUNT_MAX_LEVEL
    orig_ck = ber._COUNT_KERNEL_LEVELS
    ber._FRONT_WHOLE_MAX_LEVEL = 0
    ber._DECODE_COUNT_MAX_LEVEL = 0
    try:
        base = ber.make_step_body(code, rng="pallas-bits",
                                  rng_interpret=True)
        ref = {k: int(v) for k, v in base(key, 1.0, 256).items()}
        ber._COUNT_KERNEL_LEVELS = frozenset({code.level})
        kb = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
        got = {k: int(v) for k, v in kb(key, 1.0, 256).items()}
    finally:
        ber._FRONT_WHOLE_MAX_LEVEL = orig_fw
        ber._DECODE_COUNT_MAX_LEVEL = orig_dc
        ber._COUNT_KERNEL_LEVELS = orig_ck
    assert got == ref
    assert sum(ref.values()) > 0


def test_front_decode_cfg_rejected_on_non_hybrid_paths():
    """The front_decode_cfg A/B override must raise — not be silently
    ignored — when the level resolves to a non-hybrid step path
    (ADVICE r4): m8 systematic takes the whole-front branch, and a
    threefry step has no kernel front at all."""
    import polar_tpu.ber as ber

    code = pt.make_code(8, rate=0.5)
    with pytest.raises(ValueError, match="front_decode_cfg"):
        ber.make_step_body(code, rng="pallas-bits", rng_interpret=True,
                           front_decode_cfg=(7, 128, None))
    with pytest.raises(ValueError, match="front_decode_cfg"):
        ber.make_step_body(code, rng="threefry",
                           front_decode_cfg=(7, 128, None))


@pytest.mark.parametrize("mid", ["kernel", "xla"])
@pytest.mark.parametrize("bl,cbl", [(6, 6), (6, 5), (4, 7)])
def test_front_blocks_inject_matches_whole_front(bl, cbl, mid):
    """The block-structured large-N front (kernel A blocks + element-
    major middle + kernel B grid) must be bit-identical to the
    whole-block front kernel on identical message symbols and normals —
    including asymmetric A/B block levels, with the middle's top
    stages + refreeze as ONE Pallas pass ("kernel", the default) or as
    per-stage XLA ops ("xla")."""
    from polar_tpu.ops.pallas.step_kernel import (make_pallas_front,
                                                  make_pallas_front_blocks)

    code = pt.make_code(9, rate=0.5)
    rng = np.random.default_rng(5)
    batch, snr = 256, -1.0
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, batch))).astype(np.int8))
    nrm_t = jnp.asarray(rng.standard_normal((code.N, batch), np.float32))
    whole = make_pallas_front(code, frame_tile=128, interpret=True,
                              prng="inject")
    blockf = make_pallas_front_blocks(
        code, frame_tile=128, block_level=bl, chan_block_level=cbl,
        interpret=True, prng="inject", middle_mode=mid)
    lw, cww = whole(msg_t, nrm_t, snr)
    lb, cwb = blockf(msg_t, nrm_t, snr)
    assert np.array_equal(np.asarray(cww), np.asarray(cwb))
    assert np.array_equal(np.asarray(lw), np.asarray(lb))


def test_block_front_step_matches_whole_front_step(monkeypatch):
    """make_step_body's large-N branches must count bit-identically to
    the whole-front branch on the same key in bits mode (identical
    streams end to end) — BOTH the block front + whole-code
    decode+count kernel (m13-class) and the block front + hybrid
    lane_major decode + XLA counters (m14+-class)."""
    import polar_tpu.ber as ber

    code = pt.make_code(9, rate=0.5)
    whole = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    # force the block-front branch for this small code; level 9 <=
    # _DECODE_COUNT_MAX_LEVEL so this takes the decode_count path
    monkeypatch.setattr(ber, "_FRONT_WHOLE_MAX_LEVEL", 5)
    blockb = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    # ...the hybrid lane_major + XLA-counter path (m16+-class)...
    monkeypatch.setattr(ber, "_DECODE_COUNT_MAX_LEVEL", 5)
    blockx = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    # ...and the whole-code cw-kernel + XLA-counter path (m15-class)
    monkeypatch.setattr(ber, "_FRONT_CW_WHOLE_LEVELS", frozenset({9}))
    blockw = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    for k, snr in [(0, 14.0), (3, -1.0), (4, 1.5)]:
        a = {n: int(v)
             for n, v in blockb(jax.random.PRNGKey(k), snr, 256).items()}
        b = {n: int(v)
             for n, v in whole(jax.random.PRNGKey(k), snr, 256).items()}
        c = {n: int(v)
             for n, v in blockx(jax.random.PRNGKey(k), snr, 256).items()}
        d = {n: int(v)
             for n, v in blockw(jax.random.PRNGKey(k), snr, 256).items()}
        assert a == b, (snr, a, b)
        assert c == b, (snr, c, b)
        assert d == b, (snr, d, b)
    # odd batches fall back to the XLA chain (lazy decoder build)
    out = blockb(jax.random.PRNGKey(2), 14.0, 100)
    assert int(out["uncorrected_errors"]) == 0


def test_front_chan_cfg_override_counts_identically(monkeypatch):
    """The _FRONT_CHAN_CFG adoption hook (taller kernel-B channel
    blocks under a raised VMEM budget, sweep --stage frontcfg2) only
    moves butterfly stages between kernel B and the XLA middle — the
    step's counters must be bit-identical on the same key."""
    import polar_tpu.ber as ber

    code = pt.make_code(9, rate=0.5)
    monkeypatch.setattr(ber, "_FRONT_WHOLE_MAX_LEVEL", 5)
    base = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    monkeypatch.setattr(ber, "_FRONT_CHAN_CFG", {9: (7, 32)})
    tall = ber.make_step_body(code, rng="pallas-bits", rng_interpret=True)
    for k, snr in [(1, 0.5), (5, -1.0)]:
        a = {n: int(v)
             for n, v in base(jax.random.PRNGKey(k), snr, 256).items()}
        b = {n: int(v)
             for n, v in tall(jax.random.PRNGKey(k), snr, 256).items()}
        assert a == b, (snr, a, b)


@pytest.mark.parametrize("bl,cbl", [(5, 5), (6, 4)])
def test_front_blocks_nonsys_inject_exact(bl, cbl):
    """Non-systematic block front: (llr_t, cw_t, u0_t) must match the
    plain single-transform chain computed directly (same f32 op order:
    cw + sigma*normals, clip(rint(scale*y))), and u0_t must be the
    frozen-pinned injected symbols."""
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks
    from polar_tpu.ops.transform import polar_transform

    code = pt.make_code(9, rate=0.5)
    rng = np.random.default_rng(11)
    batch, snr = 256, -0.5
    msg_t = jnp.asarray(
        (1 - 2 * rng.integers(0, 2, (code.N, batch))).astype(np.int8))
    nrm_t = jnp.asarray(rng.standard_normal((code.N, batch), np.float32))
    front = make_pallas_front_blocks(
        code, frame_tile=128, block_level=bl, chan_block_level=cbl,
        interpret=True, prng="inject", systematic=False)
    llr_t, cw_t, u0_t = front(msg_t, nrm_t, snr)

    frozen_col = jnp.asarray(code.frozen != 0).reshape(code.N, 1)
    u0 = jnp.where(frozen_col, jnp.int8(1), msg_t)
    cw = polar_transform(u0, axis=0)
    sigma2 = 0.5 * 10.0 ** (-jnp.float32(snr) / 10.0)
    y = cw.astype(jnp.float32) + jnp.sqrt(sigma2) * nrm_t
    llr = jnp.clip(jnp.rint((2.0 / sigma2) * y), -128, 127)
    assert np.array_equal(np.asarray(u0_t), np.asarray(u0))
    assert np.array_equal(np.asarray(cw_t), np.asarray(cw, np.int8))
    assert np.array_equal(np.asarray(llr_t), np.asarray(llr, np.int8))


def test_block_front_step_nonsys_counters_match_xla_chain():
    """make_step_body's non-systematic front branch (block front + u
    lane_major decode + u-domain counters) must count exactly like the
    XLA reference chain on the same bit streams."""
    import polar_tpu.ber as ber

    code = pt.make_code(9, rate=0.5)
    body = ber.make_step_body(code, systematic=False, rng="pallas-bits",
                              rng_interpret=True)
    batch = 256
    for k, snr in [(0, 14.0), (3, -1.0), (4, 1.5)]:
        key = jax.random.PRNGKey(k)
        got = {n: int(v) for n, v in body(key, snr, batch).items()}
        kmsg, knoise = jax.random.split(key)
        nb = jax.random.bits(knoise, (code.N, batch), jnp.uint32)
        mb = jax.random.bits(kmsg, (code.N, batch), jnp.uint32)
        want = _reference_counters(code, _bits_to_sym(mb),
                                   _bits_to_normals(nb), snr,
                                   systematic=False)
        assert got == want, (snr, got, want)
