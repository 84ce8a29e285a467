"""Fused Monte-Carlo BER step as ONE Pallas TPU kernel.

The reference testbench's measurement chain — random message, systematic
encode, AWGN, LLR quantize, decode, error counting
(``/root/reference/testbench.cc:125-192``) — runs here as a single
VMEM-resident kernel per frame tile: no HBM round trips between the
stages and (in ``prng="native"`` mode) no HBM input at all beyond two
scalars. Receipts before this kernel: decode-only 33.9M frames/s at
N=1024 vs 2.8M end-to-end — ~92% of the step was XLA chain overhead
(threefry RNG, encode, counter materialization) that this kernel
removes.

Stage mapping (all element-major ``(rows, frame_tile)``, like the
decoder kernel):

* message  — one random bit per u-domain row, frozen rows forced +1
  (``testbench.cc:126-127`` draws ±1 info symbols; drawing in u-order
  and masking is the same distribution, and the systematic property
  makes the info rows of the encoded codeword the message itself, so no
  separate scatter/extract is needed)
* encode   — ``transform(refreeze(transform(u)))``
  (``polar_encoder.hh:38-57``) via the kernel-side value transform
* channel  — Box-Muller normals from uniform u32 bits; ``y = cw + σ·n``
  (``testbench.cc:151-158``)
* quantize — ``clip(rint(2/σ²·y), -128, 127)`` (``polar_helper.hh:194-198``)
* decode   — the SSA Fast-SSC body with the codeword-estimate track
  (bit-exact with the standalone decoder)
* count    — the 4 diagnostic counters + frame errors
  (``testbench.cc:185-192``), reduced per tile and summed across the
  grid outside.

PRNG modes:

* ``"native"`` — ``pltpu.prng_seed``/``prng_random_bits`` per grid step
  (TPU only; zero HBM input). Seeded from the call's JAX key + program
  id, so each (key, tile) is an independent, reproducible stream.
* ``"bits"``  — uniform u32 bits generated outside with
  ``jax.random.bits`` and streamed in; identical in-kernel math —
  CPU-testable in interpret mode (``prng_seed`` has no CPU lowering).
* ``"inject"`` — message symbols and normals fed directly; used by the
  exactness tests to compare counters bit-for-bit against the XLA step
  on identical inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...code.compiler import Node, compile_code
from ...code.construction import PolarCode
from .decoder_kernel import _SsaBuilder, _transform_value

_N_COUNTERS = 5  # uncorrected, frame, ambiguity, awgn, quant-zero
_GOLDEN = -1640531527  # 0x9E3779B9 as int32: odd, well-spread multiplier


def _cparams(sem, vmem_limit_mb=None):
    """CompilerParams with an optionally raised Mosaic scoped-VMEM
    budget — the default 16M is below the chip's physical VMEM
    (receipt ``m14-wholecode-ssa-t128-v32``: a 22.9M kernel compiles
    and runs fine at a 32M budget)."""
    return pltpu.CompilerParams(
        dimension_semantics=sem,
        vmem_limit_bytes=(vmem_limit_mb << 20) if vmem_limit_mb else None,
    )


def _key_seeds(key):
    """JAX PRNG key (or raw (2,) uint32 key data) → two int32 seed words
    for the in-kernel hardware PRNG. Shared by every PRNG kernel so the
    key→stream mapping cannot silently diverge between them."""
    kd = key if (isinstance(key, jax.Array) and key.dtype == jnp.uint32) \
        else jax.random.key_data(key)
    return jax.lax.bitcast_convert_type(kd.reshape(-1)[:2], jnp.int32)


def _bits_to_unit(b):
    """u32 bits → uniform f32 in (0, 1), both ends excluded.

    Top 24 bits (exactly representable in f32) + half-ulp offset — never
    0, so ``log(u)`` below is always finite. The shifted value fits in
    int32, so the uint32→f32 cast (unsupported by Mosaic) is routed
    through a bitcast to int32.
    """
    x = jax.lax.bitcast_convert_type(
        b >> jnp.uint32(8), jnp.int32).astype(jnp.float32)
    return (x + 0.5) * jnp.float32(1.0 / (1 << 24))


def _sincos_2pi(u):
    """``(cos(2πu), sin(2πu))`` for ``u ∈ (0, 1)`` — quadrant-reduced
    Taylor polynomials computing BOTH outputs in ~23 VPU ops total.

    Mosaic lowers ``jnp.cos``/``jnp.sin`` to a ~26-op generic
    range-reduction pull sequence EACH (mathprobe receipts,
    ``results/throughput_receipts_r3.txt`` — vs log ≈ free and
    sqrt ≈ 1.3 ops), which made one builtin trig ~75% of the channel
    kernel's math. The argument here is bounded by construction, so a
    nearest-quadrant reduction ``φ = (4u − rint(4u))·π/2 ∈ [−π/4, π/4]``
    plus degree-8/9 Taylor polynomials (remainder < 3e-8, inside builtin
    f32 accuracy) replaces both calls. Accuracy vs the builtins is
    pinned by ``tests/test_step_kernel.py::test_sincos_2pi_accuracy``.
    """
    f32 = jnp.float32
    t = f32(4.0) * u
    k = jnp.rint(t)
    phi = (t - k) * f32(np.pi / 2.0)          # in [-π/4, π/4]
    x2 = phi * phi
    # Taylor about 0: cos deg 8 (rem ~2.5e-8 at π/4), sin deg 9 (~2e-9)
    c = f32(1.0) + x2 * (f32(-1 / 2) + x2 * (
        f32(1 / 24) + x2 * (f32(-1 / 720) + x2 * f32(1 / 40320))))
    s = phi * (f32(1.0) + x2 * (f32(-1 / 6) + x2 * (
        f32(1 / 120) + x2 * (f32(-1 / 5040) + x2 * f32(1 / 362880)))))
    ki = k.astype(jnp.int32)
    swap = (ki & 1) == 1
    # cos(φ+kπ/2): k%4 → c, -s, -c, s ; sin(φ+kπ/2): k%4 → s, c, -s, -c
    sign_c = (jnp.int32(1) - ((ki + 1) & 2)).astype(f32)
    sign_s = (jnp.int32(1) - (ki & 2)).astype(f32)
    cos_out = sign_c * jnp.where(swap, s, c)
    sin_out = sign_s * jnp.where(swap, c, s)
    return cos_out, sin_out


def _bits_to_normals(b):
    """(2h, BT) u32 bits → (2h, BT) standard normals via Box-Muller.

    Rows [0, h) carry the radius draw, rows [h, 2h) the angle draw; each
    pair yields the cos and sin normals (independent), filling all 2h
    output rows.
    """
    h = b.shape[0] // 2
    u1 = _bits_to_unit(b[:h])
    u2 = _bits_to_unit(b[h:])
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
    c, s = _sincos_2pi(u2)
    return jnp.concatenate([r * c, r * s], axis=0)


def _bits_to_sym(b):
    """u32 bits → ±1 f32 symbols (lowest bit; int32 hop for Mosaic)."""
    bit = jax.lax.bitcast_convert_type(
        b & jnp.uint32(1), jnp.int32).astype(jnp.float32)
    return jnp.float32(1.0) - jnp.float32(2.0) * bit


def _random_u32(shape):
    bits = pltpu.prng_random_bits(shape)
    if bits.dtype != jnp.uint32:
        bits = pltpu.bitcast(bits, jnp.uint32)
    return bits


def _seed_grid_stream(seed_ref):
    """Seed the hardware PRNG with an independent stream per (key, grid
    step): the flattened 2-D grid index rides a golden-ratio multiply
    into the second seed word (2-operand form — Mosaic rejects a third
    ``prng_set_seed_32`` operand)."""
    flat = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (flat * jnp.int32(_GOLDEN)))


def _const_col(col: np.ndarray):
    """(N, 1) compile-time column rebuilt inside the kernel as a concat
    of broadcast scalar runs — Pallas forbids capturing materialized
    array constants, but broadcasts of Python scalars fold fine."""
    segs, i, n = [], 0, col.shape[0]
    while i < n:
        j = i
        while j < n and col[j, 0] == col[i, 0]:
            j += 1
        segs.append(jnp.full((j - i, 1), float(col[i, 0]), jnp.float32))
        i = j
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)


def _count_and_store(out_ref, llr, cw, hat, ref, info_col, wide=False):
    """The testbench counters (``testbench.cc:185-192``) over one tile,
    in the bool domain (message/codeword in ±1, decoded in {-1,0,+1};
    the arrays may be int8 or f32 — only comparisons touch them, so the
    counts are dtype-independent):

      decoded·message ≤ 0  ⟺  decoded==0 ∨ sign(decoded)≠sign(message)
      llr·codeword    < 0  ⟺  llr≠0 ∧ sign(llr)≠sign(codeword)

    ``hat`` is the decoder's estimate and ``ref`` the transmitted truth
    in the same domain: systematic mode compares the codeword-estimate
    track against the codeword (the message IS the codeword at info
    rows), non-systematic mode the u-domain leaf estimate against the
    drawn u-domain message (frozen rows +1 on both sides, so the info
    mask only gates the ambiguity counter there). f32 sums are exact
    for counts ≤ 2^24 (tile max N·BT < 2^21).

    ``out_ref`` is the WHOLE (grid, 5) SMEM array (TPU lowering rejects
    sub-(8,128) output blocks); each grid step writes its own row.
    """
    one = jnp.float32(1.0)
    if wide:
        # non-systematic kernels: with the u-track's odd-row concats in
        # the program, Mosaic's layout assignment rejects the int8
        # comparisons here ("Target does not support this comparison",
        # pointing at ``llr == 0``) — the same compares in f32 lower
        # fine, and counts are dtype-independent (values in {-128..127})
        llr = llr.astype(jnp.float32)
        cw = cw.astype(jnp.float32)
    zero_d = (hat == 0).astype(jnp.float32)
    # ref ∈ ±1, so hat==0 ⟹ hat≠ref: mismatch alone covers both arms
    err = (hat != ref).astype(jnp.float32) * info_col
    llr_z = (llr == 0).astype(jnp.float32)
    awgn = ((llr < 0) != (cw < 0)).astype(jnp.float32) * (one - llr_z)
    frame_err = jnp.max(err, axis=0, keepdims=True)
    row = pl.program_id(0)
    out_ref[row, 0] = jnp.sum(err).astype(jnp.int32)
    out_ref[row, 1] = jnp.sum(frame_err).astype(jnp.int32)
    out_ref[row, 2] = jnp.sum(zero_d * info_col).astype(jnp.int32)
    out_ref[row, 3] = jnp.sum(awgn).astype(jnp.int32)
    out_ref[row, 4] = jnp.sum(llr_z).astype(jnp.int32)


def _front(frozen_col, params_ref, msg_sym, normals, systematic=True):
    """message mask → encode → AWGN → quantize: the chain up to (and
    excluding) the decode. Returns (llr, cw, u0, info_col) in f32 —
    ``u0`` is the frozen-pinned u-domain message (the non-systematic
    error reference, ``testbench.cc:147-149``)."""
    sigma, scale = params_ref[0], params_ref[1]
    frz = _const_col(frozen_col)                        # (N, 1) f32 0/1
    info_col = jnp.float32(1.0) - frz
    one = jnp.float32(1.0)
    # encode, frozen rows pinned to +1 (twice for systematic,
    # polar_encoder.hh:38-57; once for plain, polar_encoder.hh:9-28)
    u0 = frz * one + info_col * msg_sym
    x = _transform_value(u0)
    if systematic:
        x = frz * one + info_col * x
        x = _transform_value(x)
    cw = x
    # AWGN + LLR quantize (testbench.cc:151-165)
    y = cw + sigma * normals
    llr = jnp.clip(jnp.rint(scale * y), jnp.float32(-128), jnp.float32(127))
    return llr, cw, u0, info_col


def _chain(tree, frozen_col, cdtype, systematic, wide, params_ref, out_ref,
           msg_sym, normals):
    """encode → channel → quantize → decode → count, given the message
    symbols and normals (however they were drawn).

    The values the counter epilogue needs are narrowed to int8
    immediately (exact: llr is already clipped to [-128, 127] and
    integer-valued, cw/u0 are ±1) so the f32 front arrays die before the
    decode — they otherwise stay live across the whole decode body and
    dominate the kernel's VMEM peak (the old form OOM'd at m13-t128)."""
    llr, cw, u0, info_col = _front(frozen_col, params_ref, msg_sym, normals,
                                   systematic)
    llr8 = llr.astype(jnp.int8)
    cw8 = cw.astype(jnp.int8)
    # ref8 narrowed BEFORE the decode too, so no f32 front array
    # survives into the decode body in either mode
    ref8 = cw8 if systematic else u0.astype(jnp.int8)
    wide = wide or not systematic
    b = _SsaBuilder(None, cdtype, collect_u=not systematic)
    if systematic:
        # decode with the codeword-estimate track only; errors compare
        # cw_hat vs cw at info rows (the message IS those rows). At
        # m >= 13 the compares run wide (f32): Mosaic rejects int8
        # compares over the larger concat layouts there (the same
        # rejection the nonsystematic path always works around)
        hat = b.node(tree, llr8.astype(cdtype), safe=False,
                     need_hard=False, need_cw=True)[1]
        if wide:
            hat_c, ref_c = hat, ref8.astype(hat.dtype)
        else:
            hat_c, ref_c = hat.astype(jnp.int8), ref8
    else:
        # u-domain leaf estimate vs the drawn u-domain message (frozen
        # rows are +1 on both sides). hat stays in the compute dtype:
        # u_full() concatenates odd-sized row blocks (1-row frozen
        # pieces), and Mosaic rejects int8 comparisons on that layout
        # ("Target does not support this comparison" — minimal-kernel
        # bisect: int8 cmp on odd concat fails, f32 cmp works). hat is
        # produced AFTER the decode body, so skipping its narrowing
        # costs no decode-time VMEM; ref promotes at the compare.
        b.node(tree, llr8.astype(cdtype), safe=False,
               need_hard=False, need_cw=False)
        hat_c = b.u_full()
        ref_c = ref8.astype(hat_c.dtype)
    _count_and_store(out_ref, llr8, cw8, hat_c, ref_c, info_col, wide=wide)


def _step_kernel_bits(tree, n, frozen_col, cdtype, systematic, wide,
                      params_ref, bits_ref, out_ref):
    bits = bits_ref[...]
    _chain(tree, frozen_col, cdtype, systematic, wide, params_ref, out_ref,
           _bits_to_sym(bits[n:]), _bits_to_normals(bits[:n]))


def _step_kernel_native(tree, n, frozen_col, cdtype, systematic, wide,
                        frame_tile, params_ref, seed_ref, out_ref):
    # 2-operand seed only: this Mosaic rejects a 3rd prng_set_seed_32
    # operand, so the grid index is mixed into the second word (golden-
    # ratio odd multiplier — distinct, well-spread stream per tile)
    pid_mix = pl.program_id(0) * jnp.int32(_GOLDEN)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ pid_mix)
    noise_bits = _random_u32((n, frame_tile))
    msg_bits = _random_u32((n, frame_tile))
    _chain(tree, frozen_col, cdtype, systematic, wide, params_ref, out_ref,
           _bits_to_sym(msg_bits), _bits_to_normals(noise_bits))


def _step_kernel_inject(tree, frozen_col, cdtype, systematic, wide,
                        params_ref, msg_ref, normal_ref, out_ref):
    _chain(tree, frozen_col, cdtype, systematic, wide, params_ref, out_ref,
           msg_ref[...].astype(jnp.float32), normal_ref[...])


def _snr_params(snr_db):
    """(σ, 2/σ²) for an Es/N0 in dB — float math identical to
    :func:`polar_tpu.channel.awgn_llrs` (``testbench.cc:114,162-163``)."""
    sigma2 = 0.5 * 10.0 ** (-jnp.float32(snr_db) / 10.0)
    return jnp.stack([jnp.sqrt(sigma2), 2.0 / sigma2]).astype(jnp.float32)


def make_pallas_step(
    code: PolarCode,
    tree: Node | None = None,
    *,
    frame_tile: int = 256,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    prng: str = "native",
    systematic: bool = True,
    vmem_limit_mb: int | None = None,
    wide: bool | None = None,
):
    """Build the fused Monte-Carlo step: ``step(key, snr_db, batch)`` →
    the counter dict of :func:`polar_tpu.ber.make_step_body`. ``batch``
    must be a multiple of ``frame_tile``.

    ``systematic`` selects the testbench mode: double-transform encode
    with codeword-domain error counting (``testbench.cc:131-146``), or
    the plain encoder with u-domain counting against the drawn message
    (``testbench.cc:147-149`` — the decode carries the full u-domain
    leaf track instead of the codeword-estimate track).

    ``prng``: ``"native"`` (in-kernel TPU PRNG), ``"bits"`` (u32 bits
    streamed in — CPU/interpret-testable), ``"inject"`` (test-only; the
    returned callable is ``step(msg_sym_t, normals_t, snr_db)`` with
    element-major ``(N, B)`` inputs).
    """
    if tree is None:
        tree = compile_code(code)
    n = code.N
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    if prng not in ("native", "bits", "inject"):
        raise ValueError(f"unknown prng mode {prng!r}")
    frozen_col = np.asarray(code.frozen, np.float32).reshape(n, 1)

    def call(ins, in_specs, kernel, batch):
        grid = batch // frame_tile
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            # whole-array SMEM output: per-step rows via program_id (TPU
            # lowering rejects sub-(8,128) output blocks, and grid steps
            # run serially on one core, so the shared block is safe)
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, _N_COUNTERS), jnp.int32),
            compiler_params=_cparams(("arbitrary",), vmem_limit_mb),
            interpret=interpret,
        )(*ins)

    def totals(out):
        t = jnp.sum(out, axis=0)
        return {
            "uncorrected_errors": t[0],
            "frame_errors": t[1],
            "ambiguity_erasures": t[2],
            "awgn_errors": t[3],
            "quantization_erasures": t[4],
        }

    params_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if wide is None:
        wide = code.level >= 13
    if prng == "inject":
        kernel = functools.partial(_step_kernel_inject, tree, frozen_col,
                                   compute_dtype, systematic, wide)

        def step_inject(msg_sym_t, normals_t, snr_db):
            if msg_sym_t.shape != (n, normals_t.shape[1]) or \
                    normals_t.shape[0] != n:
                raise ValueError("inject mode expects (N, B) inputs")
            batch = msg_sym_t.shape[1]
            if batch % frame_tile:
                raise ValueError(f"batch {batch} not a multiple of "
                                 f"frame_tile {frame_tile}")
            out = call(
                [_snr_params(snr_db), msg_sym_t, normals_t],
                [params_spec,
                 pl.BlockSpec((n, frame_tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((n, frame_tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)],
                kernel, batch)
            return totals(out)

        return step_inject

    if prng == "bits":
        kernel = functools.partial(_step_kernel_bits, tree, n, frozen_col,
                                   compute_dtype, systematic, wide)

        def step_bits(key, snr_db, batch: int):
            if batch % frame_tile:
                raise ValueError(f"batch {batch} not a multiple of "
                                 f"frame_tile {frame_tile}")
            bits = jax.random.bits(key, (2 * n, batch), jnp.uint32)
            out = call(
                [_snr_params(snr_db), bits],
                [params_spec,
                 pl.BlockSpec((2 * n, frame_tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)],
                kernel, batch)
            return totals(out)

        return step_bits

    kernel = functools.partial(_step_kernel_native, tree, n, frozen_col,
                               compute_dtype, systematic, wide, frame_tile)

    def step_native(key, snr_db, batch: int):
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")
        seeds = _key_seeds(key)
        out = call(
            [_snr_params(snr_db), seeds],
            [params_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
            kernel, batch)
        return totals(out)

    return step_native


def _decode_count_kernel(tree, frozen_col, cdtype, wide, llr_ref, cw_ref,
                         out_ref):
    """Decode + the testbench counters as ONE kernel: the back half of
    the zero-transpose front path. Removes the XLA counter reductions
    AND the (N, B) cw_hat HBM round trip — the decoder's codeword
    estimate is consumed in VMEM by the counter epilogue.

    ``wide``: route the counter compares through f32 — at m >= 13 the
    kernel's larger value-concat layout trips the same Mosaic "Target
    does not support this comparison" rejection of int8 compares the
    nonsystematic kernels hit (counts are dtype-independent)."""
    llr8 = llr_ref[...]
    cw8 = cw_ref[...]
    b = _SsaBuilder(None, cdtype)
    cw_hat = b.node(tree, llr8.astype(cdtype), safe=False,
                    need_hard=False, need_cw=True)[1]
    info_col = jnp.float32(1.0) - _const_col(frozen_col)
    hat8 = cw_hat if wide else cw_hat.astype(jnp.int8)
    ref8 = cw8.astype(cw_hat.dtype) if wide else cw8
    _count_and_store(out_ref, llr8, cw8, hat8, ref8, info_col, wide=wide)


def make_pallas_decode_count(
    code: PolarCode,
    tree: Node | None = None,
    *,
    frame_tile: int = 128,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    wide: bool | None = None,
    vmem_limit_mb: int | None = None,
):
    """Build ``count(llr_t, cw_t) -> counter dict``: whole-code SSA
    decode fused with the Monte-Carlo counters (``testbench.cc:185-192``
    semantics, identical math to :func:`make_pallas_step`'s epilogue).
    Inputs are element-major ``(N, B)`` int8 — exactly what
    :func:`make_pallas_front` emits — so the whole-block front step is
    two kernels with ONE (llr, cw) HBM hop between them and five scalars
    out. Counters are bit-identical to the XLA counter math on the same
    inputs (pinned by ``tests/test_step_kernel.py``)."""
    if tree is None:
        tree = compile_code(code)
    n = code.N
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    frozen_col = np.asarray(code.frozen, np.float32).reshape(n, 1)
    if wide is None:
        wide = code.level >= 13
    kernel = functools.partial(_decode_count_kernel, tree, frozen_col,
                               compute_dtype, wide)

    def count(llr_t, cw_t):
        if llr_t.shape != cw_t.shape or llr_t.shape[0] != n:
            raise ValueError(f"expected matching (N={n}, B) inputs")
        batch = llr_t.shape[1]
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")
        grid = batch // frame_tile
        blk = lambda: pl.BlockSpec((n, frame_tile), lambda i: (0, i),  # noqa: E731
                                   memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[blk(), blk()],
            # whole-array SMEM output, per-step rows via program_id (see
            # make_pallas_step: sub-(8,128) output blocks don't lower)
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, _N_COUNTERS), jnp.int32),
            compiler_params=_cparams(("arbitrary",), vmem_limit_mb),
            interpret=interpret,
        )(llr_t, cw_t)
        t = jnp.sum(out, axis=0)
        return {
            "uncorrected_errors": t[0],
            "frame_errors": t[1],
            "ambiguity_erasures": t[2],
            "awgn_errors": t[3],
            "quantization_erasures": t[4],
        }

    return count


def _count_kernel(llr_ref, cw_ref, hat_ref, mask_ref, out_ref):
    info = jnp.float32(1.0) - mask_ref[:, :1].astype(jnp.float32)
    _count_and_store(out_ref, llr_ref[...], cw_ref[...],
                     hat_ref[...].astype(jnp.float32),
                     cw_ref[...].astype(jnp.float32), info, wide=True)


def make_pallas_count(
    code: PolarCode,
    *,
    frame_tile: int = 128,
    interpret: bool = False,
    vmem_limit_mb: int | None = None,
):
    """Build ``count(llr_t, cw_t, hat_t) -> counter dict`` — the
    Monte-Carlo counter epilogue alone as one single-pass VMEM kernel
    (``testbench.cc:185-192`` semantics, the exact ``_count_and_store``
    math of the fused kernels). For the systematic levels whose fused
    decode+count cannot compile (m ≥ 15, receipt
    ``m15-decodecount-t128``) the step's XLA epilogue re-reads three
    (N, B) int8 arrays through several reduction passes; this kernel
    makes it ONE tiled pass ending in five scalars per grid step.
    Counter math is bit-identical to the XLA block on the same inputs
    (pinned by ``tests/test_step_kernel.py``). The frozen mask rides in
    as an int8 input column with a constant block index — not baked
    broadcast-run constants (the r3 program-size lesson).

    ``hat_t`` is the decoder's (N, B) codeword-estimate track (values
    in {-1, 0, +1}); compares run in f32 (dtype-independent counts,
    and int8 compares trip Mosaic's layout rejection at large N)."""
    n = code.N
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    mask_np = np.broadcast_to(
        np.asarray(code.frozen, np.int8).reshape(n, 1), (n, 128)).copy()

    def count(llr_t, cw_t, hat_t):
        if llr_t.shape != cw_t.shape or llr_t.shape != hat_t.shape \
                or llr_t.shape[0] != n:
            raise ValueError(f"expected matching (N={n}, B) inputs")
        batch = llr_t.shape[1]
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")
        grid = batch // frame_tile
        blk = lambda: pl.BlockSpec((n, frame_tile), lambda i: (0, i),  # noqa: E731
                                   memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _count_kernel,
            grid=(grid,),
            in_specs=[blk(), blk(), blk(),
                      pl.BlockSpec((n, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, _N_COUNTERS), jnp.int32),
            # the kernel stages four (N, tile) int8 blocks (+ double
            # buffering): ~48M scoped at m16-t128, far past Mosaic's 16M
            # default — callers must raise the budget at m >= 15
            # (receipt m16-countk-kernel OOM r5)
            compiler_params=_cparams(("arbitrary",), vmem_limit_mb),
            interpret=interpret,
        )(llr_t, cw_t, hat_t, jnp.asarray(mask_np))
        t = jnp.sum(out, axis=0)
        return {
            "uncorrected_errors": t[0],
            "frame_errors": t[1],
            "ambiguity_erasures": t[2],
            "awgn_errors": t[3],
            "quantization_erasures": t[4],
        }

    return count


def _front_kernel_native(n, frozen_col, frame_tile, params_ref, seed_ref,
                         llr_ref, cw_ref):
    pid_mix = pl.program_id(0) * jnp.int32(_GOLDEN)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ pid_mix)
    noise_bits = _random_u32((n, frame_tile))
    msg_bits = _random_u32((n, frame_tile))
    llr, cw, _u0, _ = _front(frozen_col, params_ref, _bits_to_sym(msg_bits),
                             _bits_to_normals(noise_bits))
    llr_ref[...] = llr.astype(jnp.int8)
    cw_ref[...] = cw.astype(jnp.int8)


def _front_kernel_inject(frozen_col, params_ref, msg_ref, normal_ref,
                         llr_ref, cw_ref):
    llr, cw, _u0, _ = _front(frozen_col, params_ref,
                             msg_ref[...].astype(jnp.float32),
                             normal_ref[...])
    llr_ref[...] = llr.astype(jnp.int8)
    cw_ref[...] = cw.astype(jnp.int8)


def make_pallas_front(
    code: PolarCode,
    *,
    frame_tile: int = 128,
    interpret: bool = False,
    prng: str = "native",
    vmem_limit_mb: int | None = None,
):
    """The Monte-Carlo step's FRONT half as one kernel: random message
    (u-domain draw, frozen rows pinned), systematic encode, AWGN,
    quantize — element-major outputs ``(llr_t, cw_t)``, both ``(N, B)``
    int8, ready for the decoder's zero-transpose ``lane_major`` entry
    and cw-domain counters. This is how the full step kernel covers
    N > 4096: the decode body (the VMEM limiter) runs as its own
    kernel; everything around it still never touches HBM mid-chain.

    ``prng``: ``"native"`` (in-kernel TPU PRNG) or ``"inject"``
    (test-only: ``front(msg_sym_t, normals_t, snr_db)``).
    """
    n = code.N
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    if prng not in ("native", "inject"):
        raise ValueError(f"unknown prng mode {prng!r}")
    frozen_col = np.asarray(code.frozen, np.float32).reshape(n, 1)

    def call(ins, in_specs, kernel, batch):
        blk = lambda: pl.BlockSpec((n, frame_tile), lambda i: (0, i),  # noqa: E731
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(batch // frame_tile,),
            in_specs=in_specs,
            out_specs=(blk(), blk()),
            out_shape=(jax.ShapeDtypeStruct((n, batch), jnp.int8),
                       jax.ShapeDtypeStruct((n, batch), jnp.int8)),
            compiler_params=_cparams(
                ("arbitrary",) if interpret else ("parallel",),
                vmem_limit_mb),
            interpret=interpret,
        )(*ins)

    params_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if prng == "inject":
        kernel = functools.partial(_front_kernel_inject, frozen_col)

        def front_inject(msg_sym_t, normals_t, snr_db):
            batch = msg_sym_t.shape[1]
            if msg_sym_t.shape != (n, batch) or normals_t.shape != (n, batch):
                raise ValueError("inject mode expects (N, B) inputs")
            if batch % frame_tile:
                raise ValueError(f"batch {batch} not a multiple of "
                                 f"frame_tile {frame_tile}")
            spec = pl.BlockSpec((n, frame_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            return call([_snr_params(snr_db), msg_sym_t, normals_t],
                        [params_spec, spec, spec], kernel, batch)

        return front_inject

    kernel = functools.partial(_front_kernel_native, n, frozen_col,
                               frame_tile)

    def front(key, snr_db, batch: int):
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")
        return call([_snr_params(snr_db), _key_seeds(key)],
                    [params_spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
                    kernel, batch)

    return front


# ---------------------------------------------------------------------
# Block-structured front for large N (the whole-block front's VMEM limit
# is N=8192): the same chain split by the butterfly's commuting stage
# factorization (see polar_tpu/ops/pallas/encode_kernel.py docstring).
# ---------------------------------------------------------------------

def _msg_block_kernel_native(mask_col, seed_ref, base_ref, o_ref):
    """Per-row-block message kernel: draw ±1 symbols, pin frozen rows to
    +1, apply the block-local bottom butterfly stages. ``base_ref`` is
    the block's flat stream offset (block_index · grid_size), so every
    (key, block, tile) triple is an independent hardware-PRNG stream."""
    pid = pl.program_id(0)
    pltpu.prng_seed(
        seed_ref[0],
        seed_ref[1] ^ ((base_ref[0] + pid) * jnp.int32(_GOLDEN)))
    sym = _bits_to_sym(_random_u32(o_ref.shape))
    if mask_col is not None:
        frz = _const_col(mask_col)
        sym = frz + (jnp.float32(1.0) - frz) * sym
    o_ref[...] = _transform_value(sym).astype(jnp.int8)


def _msg_block_kernel_inject(mask_col, msg_ref, o_ref):
    sym = msg_ref[...].astype(jnp.float32)
    if mask_col is not None:
        frz = _const_col(mask_col)
        sym = frz + (jnp.float32(1.0) - frz) * sym
    o_ref[...] = _transform_value(sym).astype(jnp.int8)


def _msg_u0_kernel_native(mask_col, seed_ref, base_ref, o_ref):
    """Non-systematic kernel A: draw ±1 u-domain symbols and pin frozen
    rows to +1 — NO butterfly (the single plain transform is split
    between the XLA middle's top stages and kernel B's bottom stages,
    which commute), so the block output IS ``u0``, the non-systematic
    error reference (``testbench.cc:147-149``)."""
    pid = pl.program_id(0)
    pltpu.prng_seed(
        seed_ref[0],
        seed_ref[1] ^ ((base_ref[0] + pid) * jnp.int32(_GOLDEN)))
    sym = _bits_to_sym(_random_u32(o_ref.shape))
    if mask_col is not None:
        frz = _const_col(mask_col)
        sym = frz + (jnp.float32(1.0) - frz) * sym
    o_ref[...] = sym.astype(jnp.int8)


def _msg_u0_kernel_inject(mask_col, msg_ref, o_ref):
    sym = msg_ref[...].astype(jnp.float32)
    if mask_col is not None:
        frz = _const_col(mask_col)
        sym = frz + (jnp.float32(1.0) - frz) * sym
    o_ref[...] = sym.astype(jnp.int8)


def _chan_block_body(params_ref, y_ref, llr_ref, cw_ref, normals):
    cw = _transform_value(y_ref[...].astype(jnp.float32))
    y = cw + params_ref[0] * normals
    llr = jnp.clip(jnp.rint(params_ref[1] * y),
                   jnp.float32(-128), jnp.float32(127))
    llr_ref[...] = llr.astype(jnp.int8)
    cw_ref[...] = cw.astype(jnp.int8)


def _chan_block_kernel_native(params_ref, seed_ref, y_ref, llr_ref, cw_ref):
    _seed_grid_stream(seed_ref)
    normals = _bits_to_normals(_random_u32(y_ref.shape))
    _chan_block_body(params_ref, y_ref, llr_ref, cw_ref, normals)


def _chan_block_kernel_inject(params_ref, y_ref, nrm_ref, llr_ref, cw_ref):
    _chan_block_body(params_ref, y_ref, llr_ref, cw_ref, nrm_ref[...])


def _stages_rows(x, h_lo: int, h_hi: int):
    """Butterfly stages ``h_lo <= h < h_hi`` on an element-major value
    ``(N, T)`` using only static row slices + concats (the in-kernel
    form of :func:`polar_transform_stages` ``axis=0`` — Mosaic-friendly:
    no reshapes). Stage h pairs rows ``[g, g+h)`` with ``[g+h, g+2h)``
    per 2h-row group: ``lo' = lo*hi, hi' = hi``."""
    n = x.shape[0]
    h = h_lo
    while h < h_hi:
        parts = []
        for g in range(0, n, 2 * h):
            lo, hi = x[g:g + h], x[g + h:g + 2 * h]
            parts.append(lo * hi)
            parts.append(hi)
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        h *= 2
    return x


def _stages_kernel(h_lo, h_hi, cdtype, x_ref, o_ref):
    """One middle stage-pass as a VMEM kernel per frame tile: butterfly
    stages ``h_lo <= h < h_hi`` on the full (N, tile) column. The XLA
    middle pays one HBM read+write per butterfly stage (3+1+4 = 8
    passes at m16 systematic, ~0.9 ms per 33.5M elements — the dominant
    front cost at m >= 15); here the column is loaded once per pass.
    Values are ±1 throughout, so bfloat16 compute is exact and halves
    the VMEM live set vs float32. Bit-exact with
    :func:`polar_transform_stages` (tested in interpret mode,
    ``tests/test_step_kernel.py``). The systematic refreeze runs as ONE
    XLA ``where`` between the two passes — baking the frozen mask as
    broadcast-run constants bloated the kernel MLIR (thousands of runs
    at rate 0.5, m >= 15; 16.4 MB at m16) toward the compile relay's
    program-size wall."""
    o_ref[...] = _stages_rows(x_ref[...].astype(cdtype), h_lo, h_hi) \
        .astype(o_ref.dtype)


# per-level "kernel" middle adoption for middle_mode="auto": the XLA
# middle is the receipted champion at m13 (front A/B 2.751M vs the r3
# fused middle kernel's 2.423M, receipts m13-frontmid-sys-*), and the
# r3 kernel middle shipped with NO passing m15/m16 receipt (its first
# steprate attempts OOM'd scoped VMEM). Levels earn a place here only
# with a passing frontmid receipt (scripts/sweep.py --stage frontmid).
_MIDDLE_KERNEL_LEVELS: frozenset = frozenset()
# receipted scoped-VMEM ceiling (r3 vmem2/vmem3 receipts); the middle
# kernel's measured need is ~4x its bf16 column + slack (receipt
# m16-steprate-sys OOM: 65.4M scoped at a 48M budget)
_MID_VMEM_CEILING_MB = 110


def make_pallas_front_blocks(
    code: PolarCode,
    *,
    frame_tile: int = 128,
    block_level: int = 13,
    chan_block_level: int | None = None,
    interpret: bool = False,
    prng: str = "native",
    systematic: bool = True,
    vmem_limit_mb: int | None = None,
    middle_mode: str = "auto",
):
    """Large-N Monte-Carlo front: :func:`make_pallas_front`'s chain as
    block-local kernels around a thin element-major XLA middle.

    The whole-block front tops out at N=8192 (one frame tile's chain
    live set must fit VMEM). Here the butterfly's commuting stage split
    (``T = P_top ∘ B_bot = B_bot ∘ P_top``, proven by
    ``tests/test_encode.py::test_transform_stage_split_commutes``)
    restructures the systematic chain ``T(mask·T(u₀))`` as

        kernel A (per 2^block_level row block): msg draw + freeze mask
            + bottom butterfly                               [VMEM]
        XLA middle (element-major, contiguous rows): top stages,
            refreeze, top stages                             [thin]
        kernel B (one 2-D grid): bottom butterfly + AWGN + quantize
                                                             [VMEM]

    so each kernel holds only a (block, frame_tile) slab and the chain
    scales to any N. All-frozen row blocks skip kernel A entirely (their
    u-domain block is +1 everywhere). Per-block freeze masks are baked
    as broadcast-run constants, deduped by pattern like the hybrid
    encoder. Kernel B draws paired Box-Muller normals in-kernel (half
    the transcendentals of the elementwise AWGN kernel's cosine-only
    form). Outputs ``(llr_t, cw_t)``, both ``(N, B)`` int8 — ready for
    the hybrid decoder's zero-transpose ``lane_major`` entry.

    Kernel B's channel math holds several f32 temporaries per block
    (PRNG bits, Box-Muller normals, the f32 codeword/LLR), so its block
    is capped one level below kernel A's by default: at
    ``chan_block_level=13`` the Mosaic scoped-VMEM allocation is 17.9 MiB
    against the 16 MiB core limit (measured OOM on v5e); 12 fits with
    room. Kernel A's ±1 butterfly has one live f32 value and runs fine
    at 13. Block levels only move stages between the kernels and the XLA
    middle — results are bit-identical for any split
    (``tests/test_step_kernel.py::test_front_blocks_inject_matches_whole_front``).

    Reference semantics: ``testbench.cc:126-165`` (message, systematic
    encode via ``polar_encoder.hh:38-57``, AWGN, int8 LLR quantize per
    ``polar_helper.hh:194-198``). The ``inject`` mode
    (``front(msg_sym_t, normals_t, snr_db)``) is bit-exact with
    :func:`make_pallas_front`'s inject mode on identical inputs.

    ``systematic=False`` runs the plain single-transform chain
    (``polar_encoder.hh:9-28``, ``testbench.cc:147-149``) and returns
    ``(llr_t, cw_t, u0_t)`` — ``u0_t`` is the frozen-pinned u-domain
    message, the non-systematic error reference. Kernel A then applies
    NO butterfly (it just draws/pins symbols, so its output IS ``u0``
    and the intermediate costs nothing extra); the middle applies
    the transform's top stages and kernel B its bottom stages — the
    commuting split covers the whole single transform.

    ``middle_mode``: ``"xla"`` keeps the per-stage XLA ops (one HBM
    read+write per stage — 8 passes at m16 systematic, the dominant
    front cost at m >= 15); ``"kernel"`` runs each run of top stages as
    ONE Pallas pass per frame tile (the whole (N, tile) ±1 column in
    VMEM, bfloat16 compute — exact for ±1) with the systematic refreeze
    as one XLA ``where`` between the two passes (3 HBM passes total at
    m16 systematic, and no baked mask constants in the kernel MLIR).
    ``"auto"`` (default) picks per level from the receipted A/Bs
    (``_MIDDLE_KERNEL_LEVELS``). Falls back to ``"xla"`` when the
    kernel's scoped-VMEM need (~4x its bf16 column) would exceed the
    receipted 110 MB ceiling — unless the caller's explicit
    ``vmem_limit_mb`` covers it. Bit-identical results in every mode.
    """
    from ..transform import polar_transform_stages

    n = code.N
    blk_a = 1 << min(block_level, code.level)
    blk_b = 1 << min(chan_block_level if chan_block_level is not None
                     else min(block_level, 12), code.level)
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    if prng not in ("native", "inject"):
        raise ValueError(f"unknown prng mode {prng!r}")
    frozen = np.asarray(code.frozen, np.int8)
    frozen_col = jnp.asarray((frozen != 0).reshape(n, 1))
    inject = prng == "inject"

    # --- kernel A: one call per row block, deduped by mask pattern ----
    a_kernels: dict = {}

    def _a_kernel(seg: np.ndarray):
        if seg.any():
            key_ = tuple(np.flatnonzero(np.diff(
                np.concatenate([[1 - seg[0]], seg])))) + (int(seg[0]),)
            mask_col = seg.astype(np.float32).reshape(blk_a, 1)
        else:
            key_, mask_col = ("allinfo",), None
        if key_ not in a_kernels:
            if systematic:
                kern = _msg_block_kernel_inject if inject \
                    else _msg_block_kernel_native
            else:
                kern = _msg_u0_kernel_inject if inject \
                    else _msg_u0_kernel_native
            a_kernels[key_] = functools.partial(kern, mask_col)
        return a_kernels[key_]

    nblk_a = n // blk_a
    segs = [frozen[b * blk_a:(b + 1) * blk_a] for b in range(nblk_a)]
    a_fns = [None if seg.all() else _a_kernel(seg) for seg in segs]
    sem = ("arbitrary",) if interpret else ("parallel",)

    def a_call(kern, ins, in_specs, batch):
        return pl.pallas_call(
            kern,
            grid=(batch // frame_tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((blk_a, frame_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((blk_a, batch), jnp.int8),
            compiler_params=_cparams(sem, vmem_limit_mb),
            interpret=interpret,
        )(*ins)

    def middle(x):
        """Top butterfly stages (+ refreeze when systematic), element-
        major int8 (values are ±1, products exact). Systematic:
        ``P_top ∘ refreeze ∘ P_top`` — kernel A supplied the first
        transform's bottom stages; kernel B applies the second's (stage
        order commutes). Plain: ``P_top`` of the single transform
        (kernel A applied nothing; kernel B does the bottom stages)."""
        if systematic:
            if blk_a < n:
                x = polar_transform_stages(x, blk_a, n, axis=0)
            x = jnp.where(frozen_col, jnp.int8(1), x)
        if blk_b < n:
            x = polar_transform_stages(x, blk_b, n, axis=0)
        return x

    if middle_mode not in ("auto", "kernel", "xla"):
        raise ValueError(f"unknown middle_mode {middle_mode!r}")
    # VMEM-budget gate: measured scoped need is ~4x the bf16 column
    # plus slack (receipt m16-steprate-sys OOM: 65.4M at a 48M budget);
    # above the receipted 110M ceiling the kernel middle cannot compile
    # — fall back to XLA unless the caller's explicit budget covers it
    # (an m17 column would estimate ~130M).
    mid_need = 4 * ((n * frame_tile * 2) >> 20) + 24
    mid_fits = mid_need <= max(_MID_VMEM_CEILING_MB, vmem_limit_mb or 0)
    use_mid_kernel = (middle_mode == "kernel" or (
        middle_mode == "auto" and code.level in _MIDDLE_KERNEL_LEVELS))
    if use_mid_kernel and mid_fits and (systematic or blk_b < n):
        mid_vmem = max(mid_need, vmem_limit_mb or 0)
        mid_blk = lambda: pl.BlockSpec(  # noqa: E731
            (n, frame_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

        def stage_pass(x, h_lo, h_hi):
            return pl.pallas_call(
                functools.partial(_stages_kernel, h_lo, h_hi,
                                  jnp.bfloat16),
                grid=(x.shape[1] // frame_tile,),
                in_specs=[mid_blk()],
                out_specs=mid_blk(),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
                compiler_params=_cparams(sem, mid_vmem),
                interpret=interpret,
            )(x)

        def middle(x):  # noqa: F811 — kernel twin of the XLA middle
            if systematic:
                if blk_a < n:
                    x = stage_pass(x, blk_a, n)
                x = jnp.where(frozen_col, jnp.int8(1), x)
            if blk_b < n:
                x = stage_pass(x, blk_b, n)
            return x

    # --- kernel B: single 2-D grid over (row blocks × frame tiles) ----
    b_kernel = _chan_block_kernel_inject if inject \
        else _chan_block_kernel_native
    sem2 = ("arbitrary", "arbitrary") if interpret else \
        ("parallel", "parallel")
    b_blk = lambda: pl.BlockSpec((blk_b, frame_tile), lambda i, j: (i, j),  # noqa: E731
                                 memory_space=pltpu.VMEM)

    def b_call(ins, in_specs, batch):
        return pl.pallas_call(
            b_kernel,
            grid=(n // blk_b, batch // frame_tile),
            in_specs=in_specs,
            out_specs=(b_blk(), b_blk()),
            out_shape=(jax.ShapeDtypeStruct((n, batch), jnp.int8),
                       jax.ShapeDtypeStruct((n, batch), jnp.int8)),
            compiler_params=_cparams(sem2, vmem_limit_mb),
            interpret=interpret,
        )(*ins)

    params_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def _check_batch(batch):
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")

    if inject:
        def front_inject(msg_sym_t, normals_t, snr_db):
            batch = msg_sym_t.shape[1]
            if msg_sym_t.shape != (n, batch) or normals_t.shape != (n, batch):
                raise ValueError("inject mode expects (N, B) inputs")
            _check_batch(batch)
            spec = pl.BlockSpec((blk_a, frame_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            blocks = [
                jnp.ones((blk_a, batch), jnp.int8) if fn is None
                else a_call(fn, [msg_sym_t[b * blk_a:(b + 1) * blk_a]],
                            [spec], batch)
                for b, fn in enumerate(a_fns)
            ]
            u0 = jnp.concatenate(blocks, axis=0) if len(blocks) > 1 \
                else blocks[0]
            llr_cw = b_call(
                [_snr_params(snr_db), middle(u0), normals_t],
                [params_spec, b_blk(), b_blk()], batch)
            return llr_cw if systematic else (*llr_cw, u0)

        return front_inject

    def draw_u0(kmsg, batch: int):
        """Kernel-A half: per-row-block message draw (+ bottom butterfly
        when systematic), concatenated to the full (N, B) int8 block."""
        seeds_a = _key_seeds(kmsg)
        ntiles = batch // frame_tile
        blocks = [
            jnp.ones((blk_a, batch), jnp.int8) if fn is None
            else a_call(fn, [seeds_a, jnp.full((1,), b * ntiles, jnp.int32)],
                        [smem, smem], batch)
            for b, fn in enumerate(a_fns)
        ]
        return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 \
            else blocks[0]

    def channel(knoise, x, snr_db):
        """Kernel-B half: bottom butterfly + AWGN + quantize on the
        middle's output."""
        return b_call([_snr_params(snr_db), _key_seeds(knoise), x],
                      [params_spec, smem, b_blk()], x.shape[1])

    def front(key, snr_db, batch: int):
        _check_batch(batch)
        kmsg, knoise = jax.random.split(key)
        u0 = draw_u0(kmsg, batch)
        llr_cw = channel(knoise, middle(u0), snr_db)
        return llr_cw if systematic else (*llr_cw, u0)

    # the parts exposed for profiling/ablation (scripts/sweep.py): the
    # composed front is exactly channel(middle(draw_u0(...)))
    front.draw_u0, front.middle, front.channel = draw_u0, middle, channel
    return front
