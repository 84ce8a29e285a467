"""Hybrid Pallas polar encoder: block-local butterfly in VMEM.

The XLA encode was the dominant cost of large-N Monte-Carlo steps —
70% of the m13 step (chain profile receipts: one 13-stage int8
transform costs 3.4 ms/batch-4096 because every stage is an HBM
round trip; the systematic encoder runs two of them). This module
runs the butterfly the way the decoder runs its tree: inside VMEM.

Structure (``tests/test_encode.py::test_transform_stage_split_commutes``
proves the algebra): the transform's stages are commuting Kronecker
factors, so ``T = P ∘ B = B ∘ P`` where B is the bottom
``block_level`` stages (h < 2^block_level — all pairs stay inside one
2^block_level-aligned row block) and P the remaining top stages. The
systematic encoder ``T(mask · T(u))`` therefore factors as

    P_top ∘ [per-block kernel: B(mask_block · B(·))] ∘ P_top

— ONE VMEM kernel pass replaces 2·block_level of the 2·log2(N) HBM
stage passes, and the mask multiply rides inside for free. For
N ≤ 2^block_level there are no top stages at all: the whole systematic
encode is one kernel. Blocks run element-major ``(rows, frame_tile)``
like the decoder; int8 in/out (codeword values are ±1, carried exactly
in f32 compute — DESIGN.md §3).

Per-block frozen masks are baked into the kernel as broadcast-run
constants (``_const_col``); blocks sharing a mask pattern share one
compiled kernel (the hybrid decoder's dedup trick,
``decode/fastssc.py``) — at large N most blocks are all-info or
all-frozen, so the kernel library stays tiny.

Reference semantics: ``polar_encoder.hh:9-59`` (same ±1-domain
butterfly, frozen slots pinned to +1 at both systematic stages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...code.construction import PolarCode
from ...encode import _scatter_message
from ..transform import polar_transform_stages
from .decoder_kernel import _transform_value
from .step_kernel import _const_col


def _block_kernel(mask_col, systematic, x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    x = _transform_value(x)
    if systematic:
        if mask_col is not None:          # None ⟺ all-info block: skip
            frz = _const_col(mask_col)
            x = frz + (jnp.float32(1.0) - frz) * x
        x = _transform_value(x)
    o_ref[...] = x.astype(o_ref.dtype)


def make_pallas_encoder(
    code: PolarCode,
    *,
    systematic: bool = True,
    frame_tile: int = 128,
    block_level: int = 13,
    interpret: bool = False,
):
    """Build ``enc(message)`` → codeword, bit-exact with
    :func:`polar_tpu.encode.encode` / ``encode_systematic``.

    ``message``: (batch, K) ±1 int8; batch must be a multiple of
    ``frame_tile``. Output: (batch, N) int8.
    """
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    block_level = min(block_level, code.level)
    blk = 1 << block_level
    n = code.N
    kernels: dict = {}   # mask-run pattern → compiled per-block kernel

    def block_fn(mask_seg: np.ndarray):
        """Kernel call for one row block, deduped by mask pattern."""
        if systematic and mask_seg.any():
            key_ = tuple(np.flatnonzero(np.diff(
                np.concatenate([[1 - mask_seg[0]], mask_seg])))) + \
                (int(mask_seg[0]),)
            mask_col = mask_seg.astype(np.float32).reshape(blk, 1)
        else:
            key_, mask_col = ("allinfo",), None
        if key_ not in kernels:
            kernels[key_] = functools.partial(
                _block_kernel, mask_col, systematic)
        kern = kernels[key_]

        def call(xt_block):
            bt = frame_tile
            return pl.pallas_call(
                kern,
                grid=(xt_block.shape[1] // bt,),
                in_specs=[pl.BlockSpec((blk, bt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((blk, bt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(xt_block.shape, jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)
                    if interpret else ("parallel",),
                ),
                interpret=interpret,
            )(xt_block)

        return call

    frozen = np.asarray(code.frozen, np.int8)
    calls = [block_fn(frozen[b * blk:(b + 1) * blk]) for b in range(n // blk)]

    def enc(message):
        if message.shape[0] % frame_tile:
            raise ValueError(
                f"batch {message.shape[0]} not a multiple of frame_tile "
                f"{frame_tile}")
        u = _scatter_message(code, message.astype(jnp.int8))
        if blk < n:
            u = polar_transform_stages(u, blk, n)   # P_top, frame-major
        ut = u.T                                    # element-major
        out = jnp.concatenate(
            [call(ut[b * blk:(b + 1) * blk]) for b, call in enumerate(calls)],
            axis=0) if len(calls) > 1 else calls[0](ut)
        cw = out.T
        # non-systematic is T(u) = B(P_top(u)) — already complete; the
        # systematic double transform needs its second P_top here:
        # cw = P(B(mask·B(P(u)))) = T(mask·T(u)) by stage commutation
        if systematic and blk < n:
            cw = polar_transform_stages(cw, blk, n)
        return cw

    return enc
