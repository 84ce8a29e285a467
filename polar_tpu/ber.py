"""Monte-Carlo BER/FER campaign harness.

The TPU-native equivalent of the reference test bench's measurement loop
(``/root/reference/testbench.cc:105-221``): for each SNR point, run batches
of random frames through encode → AWGN → quantize → decode → compare, and
accumulate the same four diagnostic counters:

* ``awgn_errors``            — channel-induced sign flips (post-quantizer)
* ``quantization_erasures``  — LLRs quantized to exactly 0
* ``uncorrected_errors``     — decoded info bits disagreeing with the message
* ``ambiguity_erasures``     — decoded info bits equal to 0

One jitted step processes a whole frame batch (thousands of frames — the
TPU's lane analog of the reference's 32 SIMD lanes); the SNR sweep loop and
early-stop logic stay in Python. Every batch is a pure function of a PRNG
key, so campaigns are restartable and shard cleanly across devices (see
``polar_tpu.parallel.campaign``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .channel import awgn_llrs, ebn0_db
from .code.construction import PolarCode, design_snr_db
from .decode.fastssc import make_fastssc_decoder
from .encode import encode, encode_systematic


@dataclass
class SnrPoint:
    snr_db: float
    ebn0_db: float
    frames: int
    bit_errors: int
    ber: float
    fer: float
    awgn_errors: int
    quantization_erasures: int
    ambiguity_erasures: int
    info_bits_per_sec: float  # decode-only throughput, Mbit/s * 1e6


@dataclass
class CampaignResult:
    code_n: int
    code_k: int
    systematic: bool
    points: list = field(default_factory=list)
    qef_snr_db: float = math.inf  # lowest SNR of the error-free tail
    peak_mbps: float = 0.0        # peak decode throughput, info Mbit/s
    seed: int | None = None       # PRNG seed (checkpoint-resume guard)

    def table(self) -> str:
        """4-column table matching ``testbench.cc:218`` (SNR BER Mbit/s Eb/N0)."""
        return "\n".join(
            f"{p.snr_db:.1f} {p.ber:g} {p.info_bits_per_sec / 1e6:.1f} {p.ebn0_db:g}"
            for p in self.points
        )


# front-path configuration (the zero-transpose element-major chain).
# The whole-block front tops out at m=12: at m13-t128 its kernel's
# scoped-VMEM allocation is 20.1M vs the 16M core limit in some program
# contexts (OOM receipt m13-steprate-front-countfused) — and the block
# front is FASTER there anyway (1.476M vs 1.165M steps/s, receipt
# m13-steprate-sys-blockfront), so m >= 13 always takes the block path.
_FRONT_WHOLE_MAX_LEVEL = 12   # make_pallas_front / whole-code SSA ceiling
_FRONT_BLOCK_LEVEL = 13       # block front kernels' row-block size
# per-level override of the block front's channel-block level and VMEM
# budget: (chan_block_level, vmem_limit_mb). EMPTY BY DEFAULT — kernel
# B's 4096-row cap was measured under the default 16M scoped budget;
# levels enter only with a winning step A/B receipt at a raised budget
# (sweep --stage frontcfg2).
_FRONT_CHAN_CFG: dict = {}
# decode+count fusion ceiling: the whole-code SSA decode_count kernel
# compiles and wins under raised Mosaic VMEM budgets — m13-t128-v32
# 3.56M fps (the bare cw-decode rate), m14-t128-v64 1.56M (receipts
# r3); above that the decode must be the hybrid, whose top levels are
# XLA.
_DECODE_COUNT_MAX_LEVEL = 14
_DECODE_COUNT_VMEM = {13: 32, 14: 64}


# in-loop hybrid configs promoted BY STEP RECEIPT (sweep --stage
# stepkl15): kl15-t128-v110 wins inside the real campaign step at m16
# (150.2K vs kl13's 129.5K steps/s, +16%) AND m17 (62.9K vs 56.1K,
# +12%) — receipts ``m16/m17-steprate-sys-kl15v110`` / ``-kl13`` r5 —
# where r3's one combined kl15 attempt had OOM'd under the default
# budget. Levels above 17 inherit the same config (the subtree kernels
# are level-local; deeper codes only add XLA top levels).
_FRONT_HYBRID_CFG = {level: (15, 128, 110) for level in range(16, 31)}


def _front_decode_cfg(level: int, u_output: bool) -> tuple[int, int, int | None]:
    """(kernel_level, kernel_frame_tile, kernel_vmem_limit_mb) for the
    front path's hybrid decoder — the decoder that runs INSIDE the
    campaign step's fori_loop. Default kl13-t128: even kl13 needed the
    dead-u-store elision ``emit_u=False`` to fit at m >= 15 (receipt
    ``m15-steprate-blockfront-kl13-nou``); levels enter
    ``_FRONT_HYBRID_CFG`` only with a winning in-loop steprate receipt
    (scripts/sweep.py --stage stepkl15)."""
    return _FRONT_HYBRID_CFG.get(level, (min(13, level - 1), 128, None))


# interpreter-kernel decode+count (ops/pallas/interp_kernel.py) for the
# systematic levels whose UNROLLED decode_count kernels cannot compile
# (m >= 15: receipt m15-decodecount-t128 HTTP-413). Levels enter this
# set only with a passing steprate receipt (sweep --stage interp);
# values are (subtree_level, vmem_limit_mb). EMPTY BY MEASUREMENT:
# the r4 receipts (m15-interp-decodecount-* 4.6K fps, m15-interparms-*)
# show the interpreter pays ~0.7 us/step per table arm once its code
# outgrows the instruction buffer, so it loses to the two-call path
# (whole-code cw decode + XLA counters) at every level it targets.
_INTERP_COUNT_LEVELS: dict = {}
# whole-code u-output kernels are the decode champions to m=16 under
# raised Mosaic VMEM budgets (receipts m14/15/16-wholecode-ssa-t128-v*);
# the non-systematic front decodes u, so it rides them directly
_FRONT_U_WHOLE_MAX_LEVEL = 16
_FRONT_U_WHOLE_VMEM = {14: 32, 15: 64, 16: 110}
# systematic fronts above the decode_count ceiling: at m15 the
# whole-code cw kernel (v110) beats the hybrid's cw track (+11%)
_FRONT_CW_WHOLE_VMEM = {15: 110}
_FRONT_CW_WHOLE_LEVELS = frozenset(_FRONT_CW_WHOLE_VMEM)
# single-pass Pallas counter epilogue (make_pallas_count) for the
# systematic levels above the decode_count fusion ceiling: replaces the
# XLA reduction passes over three (N, B) int8 arrays with one tiled
# VMEM pass. Levels enter only with a winning on-chip step A/B receipt
# (sweep --stage countk). r5 receipts: m15 WINS (331.7K vs 323.6-325.8K
# steps/s, +2.4% — the new m15 champion) and m16 LOSES (145.7K vs
# 149.7K, -2.7%: the kl15-hybrid step's XLA top already overlaps its
# counter passes), so m15 only.
_COUNT_KERNEL_LEVELS: frozenset = frozenset({15})
# the counter kernel stages four (N, tile) int8 blocks, ~24M/48M scoped
# at m15/m16 vs Mosaic's 16M default (receipt m16-countk-kernel OOM r5)
_COUNT_KERNEL_VMEM = {15: 32, 16: 64}


def make_step_body(code: PolarCode, *, systematic: bool = True, dtype=jnp.int8,
                   decoder=None, compute=None, rng: str = "threefry",
                   rng_interpret: bool = False,
                   front_decode_cfg: tuple | None = None):
    """The unjitted Monte-Carlo step body: (key, snr_db, batch) → counters.

    Exposed separately so the sharded campaign can wrap it in ``shard_map``
    (one body per device shard, counters ``psum``-reduced); single-device
    callers use :func:`make_step` which simply jits it.

    In systematic mode the decoder emits the systematic message directly
    (re-encode + info gather fused into the decode program) — bit-exact
    with the reference's extraction (``testbench.cc:177-183``).

    ``rng``: ``"threefry"`` (default) draws message bits and noise with
    JAX's counter-based PRNG; ``"pallas"`` (TPU, int8 only) replaces both
    draws with the elementwise hardware-PRNG kernels
    (:mod:`polar_tpu.ops.pallas.channel_kernel`) — same channel law,
    different (still per-key reproducible) random stream; shapes that
    can't tile (or int8-incompatible dtypes) fall back to threefry at
    trace time. ``"pallas-bits"`` is the CPU/interpret-testable variant
    (threefry-drawn bits through the identical in-kernel math).

    ``front_decode_cfg``: override the front path's in-loop hybrid
    decoder config ``(kernel_level, kernel_frame_tile,
    kernel_vmem_limit_mb)`` — measurement hook for A/Bing
    :func:`_front_decode_cfg` candidates (e.g. kl15) inside the real
    step loop before promoting them as defaults. Raises ``ValueError``
    if the configuration resolves to a non-hybrid step path (whole
    front, fused decode+count, whole-code u/cw front, interp, or no
    kernel front at all): a silently-ignored override would make an
    A/B measure the default while appearing to test the candidate
    (ADVICE r4).
    """
    pinned_decoder = decoder is not None
    enc = encode_systematic if systematic else encode

    if rng not in ("threefry", "pallas", "pallas-bits"):
        raise ValueError(f"unknown rng mode {rng!r}")
    use_kernel_rng = rng != "threefry" and jnp.dtype(dtype) == jnp.int8
    if rng == "pallas" and jax.default_backend() != "tpu":
        use_kernel_rng = False  # in-kernel PRNG has no CPU lowering
    # zero-transpose front path: the entire pre-decode chain runs
    # element-major Pallas kernels feeding the decoder's lane_major
    # entry, with cw-domain counters — no scatter, no transposes, no
    # per-stage HBM traffic. Whole-block codes (N ≤ 8192) use the single
    # front kernel + whole-code SSA decoder; larger codes the block-
    # structured front + hybrid (kl13-t128) lane-major decoder. Only
    # when the caller didn't pin a decoder.
    use_front = (use_kernel_rng and not pinned_decoder
                 and compute is None and 2 <= code.level)
    front = decode_cw_lane = decode_u_lane = decode_count = None
    count_kernel = None
    front_cfg_consumed = False
    if use_front:
        from .ops.pallas.step_kernel import _bits_to_normals, _bits_to_sym
        kprng = "inject" if rng == "pallas-bits" else "native"
        if systematic and code.level <= _FRONT_WHOLE_MAX_LEVEL:
            from .ops.pallas.step_kernel import (make_pallas_decode_count,
                                                 make_pallas_front)
            front = make_pallas_front(
                code, frame_tile=128, interpret=rng_interpret, prng=kprng)
            # decode + counters fused in one kernel: no cw_hat HBM round
            # trip, no XLA counter reductions
            decode_count = make_pallas_decode_count(
                code, frame_tile=128, interpret=rng_interpret)
        else:
            from .ops.pallas.step_kernel import make_pallas_front_blocks
            cbl, cvmem = _FRONT_CHAN_CFG.get(code.level, (None, None))
            front = make_pallas_front_blocks(
                code, frame_tile=128,
                block_level=min(_FRONT_BLOCK_LEVEL, code.level - 1),
                chan_block_level=cbl, vmem_limit_mb=cvmem,
                interpret=rng_interpret, prng=kprng, systematic=systematic)
            if systematic and code.level <= _DECODE_COUNT_MAX_LEVEL:
                # block front + whole-code decode+count kernel: no
                # cw_hat HBM round trip, no XLA counter pass. The m13/
                # m14 kernels' live sets exceed Mosaic's 16M default
                # budget — raise it (vmemprobe: physical VMEM is far
                # larger; receipts m13/m14-decodecount)
                from .ops.pallas.step_kernel import make_pallas_decode_count
                decode_count = make_pallas_decode_count(
                    code, frame_tile=128, interpret=rng_interpret,
                    vmem_limit_mb=_DECODE_COUNT_VMEM.get(code.level))
            elif systematic and code.level in _INTERP_COUNT_LEVELS:
                # the interpreter twin covers the levels whose unrolled
                # decode_count kernels exceed the compile relay's
                # program-size limit
                from .ops.pallas.interp_kernel import \
                    make_interp_decode_count
                ikl, ivmem = _INTERP_COUNT_LEVELS[code.level]
                decode_count = make_interp_decode_count(
                    code, frame_tile=128, interpret=rng_interpret,
                    subtree_level=ikl, vmem_limit_mb=ivmem)
            elif not systematic \
                    and code.level <= _FRONT_U_WHOLE_MAX_LEVEL:
                # non-systematic decode is u-output: the whole-code SSA
                # kernel is the champion to m=16 (no XLA top at all)
                from .ops.pallas.decoder_kernel import make_pallas_decoder
                front_dec = make_pallas_decoder(
                    code, frame_tile=128, compute_dtype=jnp.float32,
                    style="ssa", output_dtype=jnp.int8,
                    interpret=rng_interpret,
                    vmem_limit_mb=_FRONT_U_WHOLE_VMEM.get(code.level))
                decode_u_lane = front_dec.lane_major
            elif systematic and code.level in _FRONT_CW_WHOLE_LEVELS:
                # the whole-code cw kernel beats the hybrid's cw track
                # at m15 (receipt m15-wholecode-cw-t128-v110: 751.9K)
                from .ops.pallas.decoder_kernel import make_pallas_decoder
                front_dec = make_pallas_decoder(
                    code, frame_tile=128, compute_dtype=jnp.float32,
                    style="ssa", output="codeword", output_dtype=jnp.int8,
                    interpret=rng_interpret,
                    vmem_limit_mb=_FRONT_CW_WHOLE_VMEM.get(code.level))
                decode_cw_lane = lambda x: front_dec.lane_major(x)[1]  # noqa: E731
            else:
                front_cfg_consumed = True
                kl, ktile, kvmem = (front_decode_cfg or _front_decode_cfg(
                    code.level, u_output=not systematic))
                front_dec = make_fastssc_decoder(
                    code, output="codeword" if systematic else "u",
                    output_dtype=jnp.int8,
                    kernel_level=kl,
                    kernel_frame_tile=ktile, kernel_interpret=rng_interpret,
                    kernel_vmem_limit_mb=kvmem)
                if systematic:
                    decode_cw_lane = front_dec.lane_major
                else:
                    decode_u_lane = front_dec.lane_major
        if systematic and decode_count is None \
                and code.level in _COUNT_KERNEL_LEVELS:
            from .ops.pallas.step_kernel import make_pallas_count
            count_kernel = make_pallas_count(
                code, frame_tile=128, interpret=rng_interpret,
                vmem_limit_mb=_COUNT_KERNEL_VMEM.get(code.level))
        info_rows = jnp.asarray(code.frozen == 0).reshape(code.N, 1)
        info_idx = jnp.asarray(code.info_indices)
    if front_decode_cfg is not None and not front_cfg_consumed:
        raise ValueError(
            "front_decode_cfg was passed but this configuration does not "
            "take the hybrid front-decode path (it resolves to "
            f"{'no kernel front' if not use_front else 'a fused/whole-code front branch'} "
            f"at N={code.N}, systematic={systematic}) — the override would "
            "be silently ignored and an A/B would measure the default")
    if use_kernel_rng:
        from .ops.pallas.channel_kernel import (make_pallas_awgn,
                                                make_pallas_symbols,
                                                pick_blocks)
        from .ops.pallas.encode_kernel import make_pallas_encoder
        kmode = "bits" if rng == "pallas-bits" else "native"
        sym = make_pallas_symbols(interpret=rng_interpret, prng=kmode)
        chan = make_pallas_awgn(interpret=rng_interpret, prng=kmode)
        # the VMEM-block butterfly: the XLA encode was 70% of the large-N
        # step (chain-profile receipts)
        penc = make_pallas_encoder(code, systematic=systematic,
                                   frame_tile=128, interpret=rng_interpret)

    def draw_threefry(kmsg, knoise, snr_db, batch):
        bits = jax.random.bernoulli(kmsg, 0.5, (batch, code.K))
        message = jnp.where(bits, jnp.asarray(-1, dtype),
                            jnp.asarray(1, dtype))
        codeword = enc(code, message)
        return message, codeword, awgn_llrs(knoise, codeword, snr_db, dtype)

    def draw_kernels(kmsg, knoise, snr_db, batch):
        kenc = penc if batch % 128 == 0 else (lambda m: enc(code, m))
        if rng == "pallas-bits":
            message = sym(jax.random.bits(kmsg, (batch, code.K), jnp.uint32))
            codeword = kenc(message)
            k1, k2 = jax.random.split(knoise)
            llrs = chan(jax.random.bits(k1, (batch, code.N), jnp.uint32),
                        jax.random.bits(k2, (batch, code.N), jnp.uint32),
                        codeword, snr_db)
        else:
            message = sym(kmsg, (batch, code.K))
            codeword = kenc(message)
            llrs = chan(knoise, codeword, snr_db)
        return message, codeword, llrs

    def step_front(key, snr_db, batch):
        """Element-major end-to-end: front kernel(s) → decode+count
        kernel (whole-block systematic codes) or lane_major decode + XLA
        counters — cw-domain for systematic (the message IS the info
        rows of the codeword), u-domain for plain codes (decoded leaf
        estimate vs the drawn u0, ``testbench.cc:185-192``). Counter
        math exactness is pinned by test_step_kernel/test_channel_kernel."""
        kmsg, knoise = jax.random.split(key)
        if rng == "pallas-bits":
            nb = jax.random.bits(knoise, (code.N, batch), jnp.uint32)
            mb = jax.random.bits(kmsg, (code.N, batch), jnp.uint32)
            outs = front(_bits_to_sym(mb), _bits_to_normals(nb), snr_db)
        else:
            outs = front(key, snr_db, batch)
        if decode_count is not None:
            return decode_count(*outs)
        if systematic:
            llr_t, cw_t = outs
            hat = decode_cw_lane(llr_t)             # (N, B) cw estimate
            if count_kernel is not None:
                return count_kernel(llr_t, cw_t, hat)
            zero_d = (hat == 0) & info_rows
            err = (hat != cw_t) & info_rows
        else:
            llr_t, cw_t, u0_t = outs
            hat = decode_u_lane(llr_t)              # (K, B) u estimate
            msg = u0_t[info_idx, :]
            zero_d = hat == 0
            err = zero_d | ((hat < 0) != (msg < 0))
        awgn = (llr_t != 0) & ((llr_t < 0) != (cw_t < 0))
        return {
            "uncorrected_errors": jnp.sum(err, dtype=jnp.int32),
            "frame_errors": jnp.sum(jnp.any(err, axis=0), dtype=jnp.int32),
            "ambiguity_erasures": jnp.sum(zero_d, dtype=jnp.int32),
            "awgn_errors": jnp.sum(awgn, dtype=jnp.int32),
            "quantization_erasures": jnp.sum(llr_t == 0, dtype=jnp.int32),
        }

    # the non-front fallback's decoder is built lazily: front-path
    # campaigns never trace it (champion decoder construction is real
    # work, and the front has its own fused decode)
    _dec_cell = [decoder] if pinned_decoder else []

    def get_decoder():
        if not _dec_cell:
            if compute is None and jnp.dtype(dtype) == jnp.int8:
                # champion decoder for the current backend (pallas/
                # hybrid on TPU, XLA elsewhere) — bit-exact variants.
                # Only for int8 LLRs: the kernels' integer-exact
                # arithmetic (clip-based sign) needs integer values.
                from .decode.auto import make_auto_decoder

                _dec_cell.append(make_auto_decoder(
                    code, output="systematic" if systematic else "u",
                    output_dtype=dtype)[0])
            else:
                _dec_cell.append(make_fastssc_decoder(
                    code, output="systematic" if systematic else "u",
                    compute=compute, output_dtype=dtype))
        return _dec_cell[0]

    def step(key, snr_db, batch: int):
        if use_front and batch % 128 == 0:
            return step_front(key, snr_db, batch)
        kmsg, knoise = jax.random.split(key)
        draw = draw_threefry
        if use_kernel_rng and pick_blocks(batch, code.K) is not None \
                and pick_blocks(batch, code.N) is not None:
            draw = draw_kernels
        message, codeword, llrs = draw(kmsg, knoise, snr_db, batch)
        decoded = get_decoder()(llrs)
        # counters in the bool domain — no (B, N)/(B, K) int32
        # intermediates. Exact equivalences for message/codeword in
        # {-1,+1} and decoded/llrs int8:
        #   decoded*message <= 0  ⟺  decoded==0 ∨ sign(decoded)≠sign(message)
        #   llrs*codeword   <  0  ⟺  llrs≠0 ∧ sign(llrs)≠sign(codeword)
        zero_d = decoded == 0
        errs = zero_d | ((decoded < 0) != (message < 0))
        frame_err = jnp.any(errs, axis=-1)
        return {
            "uncorrected_errors": jnp.sum(errs, dtype=jnp.int32),
            "frame_errors": jnp.sum(frame_err, dtype=jnp.int32),
            "ambiguity_erasures": jnp.sum(zero_d, dtype=jnp.int32),
            "awgn_errors": jnp.sum(
                (llrs != 0) & ((llrs < 0) != (codeword < 0)),
                dtype=jnp.int32,
            ),
            "quantization_erasures": jnp.sum(llrs == 0, dtype=jnp.int32),
        }

    return step


def make_step(code: PolarCode, *, systematic: bool = True, dtype=jnp.int8,
              decoder=None, compute=None, fused: str | bool = "auto",
              fused_frame_tile: int | None = None):
    """Build the jitted Monte-Carlo step: ``step(key, snr_db, batch)``.

    Counters come back as int32 device scalars and are accumulated into
    Python ints host-side, so campaign totals never overflow. The whole
    chain (message gen, encode, channel, decode, scoring) runs in one XLA
    program on device; ``snr_db`` is traced, so one compilation serves the
    entire waterfall sweep.

    ``fused``: ``"auto"`` (default) uses the single-Pallas-kernel step
    (:func:`polar_tpu.ops.pallas.step_kernel.make_pallas_step` — message
    gen, encode, AWGN, quantize, decode and counters all in VMEM, in-
    kernel PRNG) on the TPU backend for int8 fused-eligible levels
    (2..12 and 14; systematic and
    plain modes);
    batches that aren't a ``fused_frame_tile`` multiple fall back to the
    XLA chain at trace time (the default tile is the measured per-N
    champion: 128 at N=4096, else 256). ``True`` forces it (raises if
    unsupported), ``False`` disables. The fused step draws its own PRNG
    streams (per key + tile), so its waterfall is statistically — not
    bitwise — identical to the XLA chain's (both are Monte-Carlo over
    the same channel law; tests pin the exactness of everything but the
    random draw).
    """
    body = _make_dispatch_body(code, systematic=systematic, dtype=dtype,
                               decoder=decoder, compute=compute, fused=fused,
                               fused_frame_tile=fused_frame_tile)
    return jax.jit(body, static_argnums=(2,))


# whole-step kernel coverage: levels 2..12 under the default VMEM
# budget, plus m14 under a raised one — where the fused kernel BEATS the
# block front in BOTH modes (sys 824.2K vs 724.4K steps/s, nonsys
# 932.8K vs 827.1K; receipts m14-stepkernel-*-t128-v96 r3). At m13 the
# block front wins instead in both modes (sys 1.681M vs 1.634M fused,
# nonsys 1.916M vs 1.829M), so m13 stays unfused.
_FUSED_LEVELS = frozenset(range(2, 13)) | {14}
_FUSED_TILE_BY_LEVEL = {11: 256, 12: 128, 14: 128}  # else 256
_FUSED_VMEM_BY_LEVEL = {13: 48, 14: 96}


def _fused_step_eligible(code, systematic, dtype, compute) -> bool:
    """Whether the fused Pallas step kernel covers this configuration
    (int8, levels 2..12 at the default VMEM budget plus m14 at a raised
    one — the step's live set is ~2.5× the decode-only kernel's; both
    systematic and plain modes are kernelized); the
    TPU-backend check is separate because eligibility is also consulted
    by run_campaign."""
    return (compute is None
            and jnp.dtype(dtype) == jnp.int8
            and code.level in _FUSED_LEVELS)


def _front_step_eligible(code, dtype, compute) -> bool:
    """Whether the zero-transpose kernel front covers this configuration:
    int8, any N, BOTH encode modes — the non-systematic block front was
    measured FASTER than the systematic one (single transform, u-domain
    counters; receipts ``m13/m14-steprate-nonsys-blockfront``:
    1.782M / 831.9K steps/s vs 619.2K / 295.0K for the threefry chain)."""
    return (compute is None and jnp.dtype(dtype) == jnp.int8
            and 2 <= code.level)


def _make_dispatch_body(code, *, systematic, dtype, decoder, compute, fused,
                        fused_frame_tile):
    if fused_frame_tile is None:
        fused_frame_tile = _FUSED_TILE_BY_LEVEL.get(code.level, 256)
    use_fused = False
    if fused == "auto":
        use_fused = (decoder is None
                     and _fused_step_eligible(code, systematic, dtype, compute)
                     and jax.default_backend() == "tpu")
    elif fused:
        if not _fused_step_eligible(code, systematic, dtype, compute):
            raise ValueError(
                "fused step supports int8 mode (no compute override) at "
                f"levels {sorted(_FUSED_LEVELS)} only (got N={code.N}, "
                f"dtype={jnp.dtype(dtype)}, compute={compute!r})")
        use_fused = True
    # second rung of the ladder: when the whole-step kernel doesn't apply
    # (large N, or a caller-pinned decoder), still replace the threefry
    # message/noise draws with the elementwise hardware-PRNG kernels —
    # they tile at any N and compose with any int8 decoder.
    rng = ("pallas" if (fused == "auto" and compute is None
                        and jnp.dtype(dtype) == jnp.int8
                        and jax.default_backend() == "tpu")
           else "threefry")

    def make_body():
        return make_step_body(code, systematic=systematic, dtype=dtype,
                              decoder=decoder, compute=compute, rng=rng)

    if not use_fused:
        return make_body()
    from .ops.pallas.step_kernel import make_pallas_step

    fused_body = make_pallas_step(
        code, frame_tile=fused_frame_tile, prng="native",
        systematic=systematic,
        vmem_limit_mb=_FUSED_VMEM_BY_LEVEL.get(code.level))
    # the XLA fallback (non-tile-multiple batches) builds its decoder
    # lazily: most fused campaigns never trace it, and the champion
    # decoder build is real work (kernel program construction)
    fallback = []

    def dispatch(key, snr_db, batch: int):
        if batch % fused_frame_tile == 0:
            return fused_body(key, snr_db, batch)
        if not fallback:
            fallback.append(make_body())
        return fallback[0](key, snr_db, batch)

    return dispatch


def make_multi_step(code: PolarCode, *, systematic: bool = True,
                    dtype=jnp.int8, decoder=None, compute=None,
                    fused: str | bool = "auto",
                    fused_frame_tile: int | None = None):
    """Build ``multi(key, snr_db, batch, steps)`` — ``steps`` Monte-Carlo
    steps chained on device (keys split inside a ``fori_loop``), counters
    accumulated and pulled ONCE. Amortizes the per-call dispatch +
    host-transfer latency, which at fused-step rates is a real fraction
    of each step (the campaign's analog of the benchmark's chained
    runner). Counter totals stay in int32: keep
    ``steps * batch * N < 2^31`` (asserted — the awgn/quantization
    diagnostics count over all N channel bits per frame, not just the K
    info bits, so N is the binding domain).
    """
    body = _make_dispatch_body(code, systematic=systematic, dtype=dtype,
                               decoder=decoder, compute=compute, fused=fused,
                               fused_frame_tile=fused_frame_tile)

    def multi(key, snr_db, batch: int, steps: int):
        assert steps * batch * code.N < (1 << 31), \
            "int32 counter overflow risk: lower steps_per_call"

        def loop_body(_, carry):
            k, acc = carry
            k, sub = jax.random.split(k)
            out = body(sub, snr_db, batch)
            return k, {name: acc[name] + out[name] for name in acc}

        zeros = {name: jnp.int32(0) for name in (
            "uncorrected_errors", "frame_errors", "ambiguity_erasures",
            "awgn_errors", "quantization_erasures")}
        _, acc = jax.lax.fori_loop(0, steps, loop_body, (key, zeros))
        return acc

    return jax.jit(multi, static_argnums=(2, 3))


def run_point(
    code: PolarCode,
    snr_db: float,
    *,
    key,
    step=None,
    systematic: bool = True,
    dtype=jnp.int8,
    batch: int = 4096,
    max_frames: int = 1 << 16,
    target_bit_errors: int = 1000,
    decode_fn=None,
    measure_throughput: bool = False,
    steps_per_call: int = 1,
) -> SnrPoint:
    """Measure one SNR point, stopping once enough errors are seen
    (``testbench.cc:125``: errors >= 1000 or the frame budget is hit).

    ``steps_per_call`` > 1 chains that many Monte-Carlo steps on device
    per host round trip (``step`` must then be a
    :func:`make_multi_step` callable); the early-stop check runs at the
    coarser granularity.
    """
    if step is None:
        if steps_per_call > 1:
            step = make_multi_step(code, systematic=systematic, dtype=dtype)
        else:
            step = make_step(code, systematic=systematic, dtype=dtype)
    totals = {}
    frames = 0
    while frames < max_frames and totals.get("uncorrected_errors", 0) < target_bit_errors:
        key, sub = jax.random.split(key)
        if steps_per_call > 1:
            out = jax.device_get(step(sub, snr_db, batch, steps_per_call))
            frames += batch * steps_per_call
        else:
            out = jax.device_get(step(sub, snr_db, batch))
            frames += batch
        for k, v in out.items():
            totals[k] = totals.get(k, 0) + int(v)

    mbps = 0.0
    if measure_throughput and decode_fn is not None:
        mbps = measure_decode_throughput(code, decode_fn, snr_db, key, batch, dtype)

    bits = frames * code.K
    return SnrPoint(
        snr_db=snr_db,
        ebn0_db=ebn0_db(snr_db, code.rate),
        frames=frames,
        bit_errors=totals["uncorrected_errors"],
        ber=totals["uncorrected_errors"] / bits,
        fer=totals["frame_errors"] / frames,
        awgn_errors=totals["awgn_errors"],
        quantization_erasures=totals["quantization_erasures"],
        ambiguity_erasures=totals["ambiguity_erasures"],
        info_bits_per_sec=mbps,
    )


def measure_decode_throughput(code, decode_fn, snr_db, key, batch, dtype,
                              iters: int = 32, repeats: int = 3) -> float:
    """Decode-only throughput in info bits/s (compile excluded), the analog
    of the timed region at ``testbench.cc:170-174``. Uses the chained
    slope method (:mod:`polar_tpu.utils.benchmark`) so async-dispatch acks
    and remote-execute dedup cannot inflate the number.

    ``repeats`` must stay >= 2: with a single repeat the cross-repeat
    slope-consistency check is inert and relay-side per-request jitter
    can pass the acceptance test with a slope that is off by 40x+
    (measured: iters=8/repeats=1 reported 5-18K fps for a decoder whose
    converged throughput is 865K fps — receipt ``m13-sys-gauge-*`` in
    results/throughput_receipts_r2.txt)."""
    from .utils.benchmark import measure_decode_fps

    k1, k2 = jax.random.split(key)
    bits = jax.random.bernoulli(k1, 0.5, (batch, code.K))
    message = jnp.where(bits, jnp.asarray(-1, dtype), jnp.asarray(1, dtype))
    llrs = awgn_llrs(k2, encode(code, message), snr_db, dtype)
    return measure_decode_fps(decode_fn, llrs, iters=iters,
                              repeats=repeats) * code.K


def run_campaign(
    code: PolarCode,
    *,
    seed: int = 0,
    systematic: bool = True,
    dtype=jnp.int8,
    batch: int = 4096,
    max_frames_per_point: int = 1 << 16,
    target_bit_errors: int = 1000,
    snr_range: tuple | None = None,
    snr_step: float = 0.1,
    stop_after_clean: int = 4,
    measure_throughput: bool = True,
    verbose: bool = False,
    compute=None,
    checkpoint_path=None,
    decoder=None,
    steps_per_call: int = 1,
    fused: str | bool = "auto",
) -> CampaignResult:
    """Full waterfall sweep with the reference's early-stop rule: finish
    after ``stop_after_clean`` consecutive error-free points
    (``testbench.cc:110,198-201``).

    With ``checkpoint_path``, the result JSON is rewritten after every SNR
    point and previously-completed points are reloaded on restart — each
    point is a pure function of its PRNG key, so a resumed campaign is
    identical to an uninterrupted one (SURVEY.md §5 checkpoint/resume).

    On TPU, int8 campaigns draw from the hardware-PRNG Pallas kernels:
    the whole step runs as the fused megakernel at eligible levels
    (unless ``decoder=`` pins a specific decode path), and larger codes
    keep their decoder but use the elementwise message/AWGN kernels (see
    :func:`make_step`). Pass ``fused=False`` to pin the pre-kernel
    threefry XLA chain — e.g. to extend a checkpoint recorded with it
    using the identical per-key random stream.
    """
    design = design_snr_db(1.0 - code.rate)
    if snr_range is None:
        snr_range = (math.floor(design - 3), math.ceil(design + 5))
    # when a kernel step path covers this config on TPU — the fused
    # megakernel (eligible levels) or the zero-transpose front chain —
    # the step is built WITHOUT a decoder so make_step's auto dispatch
    # can pick it (a passed-in decoder pins the XLA chain); the
    # standalone decoder below then only serves the decode-only Mb/s
    # gauge
    on_tpu = jax.default_backend() == "tpu"
    fused_step = (fused == "auto" and decoder is None
                  and _fused_step_eligible(code, systematic, dtype, compute)
                  and on_tpu)
    front_step = (fused == "auto" and decoder is None and on_tpu
                  and _front_step_eligible(code, dtype, compute))
    kernel_step = fused_step or front_step
    if decoder is None and (measure_throughput or not kernel_step):
        # build the decoder ONCE and share it between the Monte-Carlo step
        # and the throughput measurement (one trace/compile per campaign —
        # remote compiles are minutes, so the duplicate build was real time)
        if compute is None and jnp.dtype(dtype) == jnp.int8:
            from .decode.auto import make_auto_decoder

            decoder, _ = make_auto_decoder(
                code, output="systematic" if systematic else "u",
                output_dtype=dtype,
            )
        else:
            decoder = make_fastssc_decoder(
                code, output="systematic" if systematic else "u",
                compute=compute, output_dtype=dtype,
            )
    step_decoder = None if kernel_step else decoder
    if steps_per_call > 1:
        step = make_multi_step(code, systematic=systematic, dtype=dtype,
                               compute=compute, decoder=step_decoder,
                               fused=fused)
    else:
        step = make_step(code, systematic=systematic, dtype=dtype,
                         compute=compute, decoder=step_decoder, fused=fused)
    key = jax.random.PRNGKey(seed)
    result = CampaignResult(code_n=code.N, code_k=code.K,
                            systematic=systematic, seed=seed)
    done: dict = {}
    if checkpoint_path is not None:
        from .campaign_io import load_result, save_result

        prev = load_result(checkpoint_path)
        if (prev is not None
                and (prev.code_n, prev.code_k) == (code.N, code.K)
                and prev.systematic == systematic
                and prev.seed in (None, seed)):
            done = {round(p.snr_db, 6): p for p in prev.points}
    clean = 0
    snr = snr_range[0]
    mbps = None  # decode-only gauge, measured ONCE per campaign (below)
    while snr <= snr_range[1] + 1e-9 and clean < stop_after_clean:
        key, sub = jax.random.split(key)
        snr_r = round(snr, 6)
        if snr_r in done:
            point = done[snr_r]
        else:
            point = run_point(
                code, snr_r, key=sub, step=step, systematic=systematic,
                dtype=dtype, batch=batch, max_frames=max_frames_per_point,
                target_bit_errors=target_bit_errors,
                measure_throughput=False, steps_per_call=steps_per_call,
            )
            if measure_throughput:
                # Fast-SSC decode is data-independent (static shapes, no
                # data-dependent control flow), so the per-point Mb/s of
                # the reference's table (testbench.cc:218) is one number
                # here: measure it once, honestly (multi-repeat slope
                # consistency — see measure_decode_throughput), and stamp
                # it on every computed point.
                if mbps is None:
                    mbps = measure_decode_throughput(
                        code, decoder, snr_r, sub, batch, dtype)
                point.info_bits_per_sec = mbps
        result.points.append(point)
        result.peak_mbps = max(result.peak_mbps, point.info_bits_per_sec / 1e6)
        if point.bit_errors == 0:
            result.qef_snr_db = min(result.qef_snr_db, point.snr_db)
            clean += 1
        else:
            clean = 0
            result.qef_snr_db = math.inf
        if verbose:
            print(
                f"{point.snr_db:.1f} {point.ber:g} "
                f"{point.info_bits_per_sec / 1e6:.1f} {point.ebn0_db:g}",
                flush=True,
            )
        if checkpoint_path is not None:
            save_result(result, checkpoint_path)
        snr += snr_step
    return result
