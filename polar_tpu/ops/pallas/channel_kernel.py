"""Elementwise PRNG kernels: message symbols and the AWGN+quantize pass.

The whole-step megakernel (:mod:`.step_kernel`) tops out at N=4096 —
its live set (message, noise, codeword, LLRs **and** the decode body)
must fit VMEM per frame tile. For larger codes the decode runs as the
hybrid (XLA top + subtree kernels), and the Monte-Carlo chain around it
was pure XLA — dominated by threefry RNG (~10 VPU ops per random word;
an N=8192 batch-4096 step draws 33M noise words, receipt
``m13-steprate-sys``: the chain ran at 11% of decode-only rate).

These two kernels replace the threefry draws with the TPU's hardware
PRNG, *without* any whole-frame constraint: both are elementwise, so
the grid tiles (rows × cols) freely at any N —

* :func:`make_pallas_symbols` — random ±1 int8 message symbols
  (``testbench.cc:126-127``);
* :func:`make_pallas_awgn` — ``llr = quant(2/σ²·(cw + σ·n))`` with
  in-kernel normals (``testbench.cc:151-165``), one read of the
  codeword and one write of the LLRs (the XLA chain's materialized
  normals never exist).

Normals use the cosine Box-Muller form ``n = √(−2 ln u1)·cos(2π u2)``
— exact standard normals from two independent uniforms per element
(the paired sin/cos variant of the step kernel needs a row split that
an elementwise grid does not have). Every (key, grid-step) pair seeds
an independent hardware-PRNG stream.

Encode and decode stay outside: the butterfly and the hybrid decoder
already have their own optimized paths; this module removes the RNG
wall between them. Exactness strategy mirrors the step kernel: a
``bits`` mode streams externally-drawn u32 bits through the identical
in-kernel math (CPU/interpret-testable); ``native`` differs only in
where the bits come from.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .step_kernel import (_bits_to_unit, _key_seeds, _random_u32,
                          _seed_grid_stream, _sincos_2pi)


def _normals(shape, bits=None):
    """Standard normals: cosine Box-Muller over two uniform draws (the
    cosine from the quadrant-reduced polynomial — Mosaic's builtin trig
    costs ~26 VPU ops, see :func:`.step_kernel._sincos_2pi`)."""
    if bits is None:
        u1 = _bits_to_unit(_random_u32(shape))
        u2 = _bits_to_unit(_random_u32(shape))
    else:
        u1, u2 = _bits_to_unit(bits[0]), _bits_to_unit(bits[1])
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
    return r * _sincos_2pi(u2)[0]


def _awgn_body(params_ref, cw_ref, out_ref, bits=None):
    sigma, scale = params_ref[0], params_ref[1]
    n = _normals(cw_ref.shape, bits)
    y = cw_ref[...].astype(jnp.float32) + sigma * n
    llr = jnp.clip(jnp.rint(scale * y), jnp.float32(-128), jnp.float32(127))
    out_ref[...] = llr.astype(jnp.int8)


def _awgn_kernel_native(params_ref, seed_ref, cw_ref, out_ref):
    _seed_grid_stream(seed_ref)
    _awgn_body(params_ref, cw_ref, out_ref)


def _awgn_kernel_bits(params_ref, cw_ref, b1_ref, b2_ref, out_ref):
    _awgn_body(params_ref, cw_ref, out_ref, bits=(b1_ref[...], b2_ref[...]))


def _sym_kernel_native(seed_ref, out_ref):
    _seed_grid_stream(seed_ref)
    bit = jax.lax.bitcast_convert_type(
        _random_u32(out_ref.shape) & jnp.uint32(1), jnp.int32)
    out_ref[...] = (jnp.int32(1) - jnp.int32(2) * bit).astype(jnp.int8)


def _sym_kernel_bits(b_ref, out_ref):
    bit = jax.lax.bitcast_convert_type(b_ref[...] & jnp.uint32(1), jnp.int32)
    out_ref[...] = (jnp.int32(1) - jnp.int32(2) * bit).astype(jnp.int8)


def pick_blocks(rows: int, cols: int):
    """(row-block, col-block) for an elementwise int8/f32 grid, or None
    if the shape can't tile cleanly (callers fall back to the XLA path).
    Row blocks are multiples of 32 (int8 sublane tile), col blocks of
    128 (lane width)."""
    rb = next((r for r in (256, 128, 64, 32) if rows % r == 0), None)
    cb = next((c for c in (512, 256, 128) if cols % c == 0), None)
    if rb is None or cb is None:
        return None
    return rb, cb


def _grid_call(kernel, ins, in_specs, rows, cols, rb, cb, interpret):
    return pl.pallas_call(
        kernel,
        grid=(rows // rb, cols // cb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, cb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int8),
        # unlike the step kernel (whole-array shared SMEM output), these
        # output blocks are disjoint per grid step and each step seeds an
        # independent PRNG stream — safe to let Mosaic parallelize
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
            if interpret else ("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*ins)


def make_pallas_symbols(*, interpret: bool = False, prng: str = "native"):
    """``sym(key, (rows, cols))`` → random ±1 int8 symbols. In ``bits``
    mode the callable is ``sym(bits_u32)`` (same shape)."""
    if prng == "bits":
        def sym_bits(bits):
            rows, cols = bits.shape
            rb, cb = pick_blocks(rows, cols)
            return _grid_call(
                _sym_kernel_bits, [bits],
                [pl.BlockSpec((rb, cb), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)],
                rows, cols, rb, cb, interpret)

        return sym_bits

    def sym(key, shape):
        rows, cols = shape
        rb, cb = pick_blocks(rows, cols)
        return _grid_call(
            _sym_kernel_native, [_key_seeds(key)],
            [pl.BlockSpec(memory_space=pltpu.SMEM)],
            rows, cols, rb, cb, interpret)

    return sym


def make_pallas_awgn(*, interpret: bool = False, prng: str = "native"):
    """``awgn(key, codeword, snr_db)`` → saturating int8 LLRs, exactly
    :func:`polar_tpu.channel.awgn_llrs`'s math with in-kernel normals.
    In ``bits`` mode the callable is ``awgn(b1, b2, codeword, snr_db)``
    with two u32 bit arrays of the codeword's shape."""
    from .step_kernel import _snr_params

    cw_spec = lambda rb, cb: pl.BlockSpec((rb, cb), lambda i, j: (i, j),  # noqa: E731
                                          memory_space=pltpu.VMEM)

    if prng == "bits":
        def awgn_bits(b1, b2, codeword, snr_db):
            rows, cols = codeword.shape
            rb, cb = pick_blocks(rows, cols)
            return _grid_call(
                _awgn_kernel_bits,
                [_snr_params(snr_db), codeword, b1, b2],
                [pl.BlockSpec(memory_space=pltpu.SMEM),
                 cw_spec(rb, cb), cw_spec(rb, cb), cw_spec(rb, cb)],
                rows, cols, rb, cb, interpret)

        return awgn_bits

    def awgn(key, codeword, snr_db):
        rows, cols = codeword.shape
        rb, cb = pick_blocks(rows, cols)
        return _grid_call(
            _awgn_kernel_native,
            [_snr_params(snr_db), _key_seeds(key), codeword],
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM), cw_spec(rb, cb)],
            rows, cols, rb, cb, interpret)

    return awgn
