"""Pallas TPU megakernel for Fast-SSC decoding.

One kernel instance decodes a tile of frames end-to-end **entirely in
VMEM**: the soft-LLR pyramid and hard-decision stack of the reference
decoder (``/root/reference/polar_decoder.hh:128-129`` — ``soft[2N]``,
``hard[N]``) become VMEM scratch buffers, and the pruned-tree recursion
runs at trace time, emitting a fully unrolled Mosaic program with only
**static** row slices. No HBM round-trips between tree levels — the
XLA-path decoder materializes O(#nodes) intermediates through HBM; here
the only HBM traffic is the input LLR block and the output message block.

Layout: **element-major** ``(N, frame_tile)`` — frames ride the 128-wide
lane axis (every op uses all lanes regardless of node size), code
elements ride sublanes. The grid is 1-D over frame tiles; blocks stream
through the kernel with automatic double-buffered DMA.

Numerics: the kernel computes in float32/bfloat16 carrying the exact
saturating-int8 semantics (:class:`~polar_tpu.ops.arith.QuantFloatArith`
— integers ≤ 256 are exact even in bf16), so results are bit-identical
to the reference's int8 SIMD decoder.

Every per-node operation is expressed as elementwise ops on contiguous
row ranges plus fold-in-half recursions (rep's adder tree
``polar_decoder.hh:94-106``, SPC's parity/min reductions ``107-127``,
and the message transform as ``T(x) = [T(x_lo * x_hi), T(x_hi)]``) —
no reshapes, shuffles, or gathers anywhere in the kernel.
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

I8_MIN = -128
I8_MAX = 127


def _clip8(x):
    return jnp.clip(x, jnp.asarray(I8_MIN, x.dtype), jnp.asarray(I8_MAX, x.dtype))


def _isign(x):
    """sign(x) for integer-valued x: clip(x, -1, 1).

    Exact because every value in the kernel is an integer (LLRs, sums,
    products — all in [-256, 256]); cheaper than a generic sign, and it
    avoids jnp.sign entirely (which crashes this environment's Mosaic
    compile helper under bfloat16).
    """
    one = jnp.asarray(1, x.dtype)
    return jnp.clip(x, -one, one)


def _guard(x, safe: bool):
    """qabs/madd's -128 guard: max(x, -127) — skipped when the slot
    provably cannot contain -128 (every f-produced slot: |f| <= 127)."""
    if safe:
        return x
    return jnp.maximum(x, jnp.asarray(-127, x.dtype))


def _sat_g(h, ap, b):
    """g: sat8(sign(h) * max(a, -127) + b).

    ``h`` is a hard value in {-1, 0, +1} by construction, so ``sign(h)``
    is ``h`` itself; ``ap`` is the pre-guarded first half."""
    return _clip8(h * ap + b)


def _sat_add(a, b):
    return _clip8(a + b)


def _decide(a):
    # -1 for a<0 else +1 for integer-valued a, mask- and sign-free:
    # clip(2a+1, -1, 1) (a>=0 -> 2a+1>=1 -> +1; a<=-1 -> 2a+1<=-1 -> -1).
    return _isign(a + a + jnp.asarray(1, a.dtype))


def _transform_value(x):
    """Polar transform of a (len, BT) hard-value array along rows.

    Recursive halving form T(x) = concat(T(x_lo * x_hi), T(x_hi)) —
    equivalent to the stage butterfly of ``polar_encoder.hh:17-26`` but
    built only from contiguous slices.
    """
    n = x.shape[0]
    if n == 1:
        return x
    h = n // 2
    return jnp.concatenate(
        [_transform_value(x[:h] * x[h:]), _transform_value(x[h:])], axis=0
    )


def _fold(x, op):
    """Fold-in-half reduction along rows down to a single (1, BT) row."""
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = op(x[:h], x[h:])
    return x


class _KernelBuilder:
    """Trace-time recursion writing the unrolled kernel body.

    Mirrors the reference dispatcher's pointer bookkeeping
    (``polar_decoder.hh:131-464``): ``soft`` rows ``[len, 2len)`` hold the
    level-``len`` LLR slot (the pyramid), ``hoff`` is the hard-stack base,
    ``moff`` the message-output cursor. All three are Python ints at trace
    time, so every slice below is static.
    """

    def __init__(self, soft, hard, mesg, compute_dtype=None):
        self.soft = soft
        self.hard = hard
        self.mesg = mesg
        self.moff = 0
        # storage dtype may differ from compute dtype (e.g. int8 scratch
        # halves VMEM so whole-code pyramids fit at larger N); values are
        # converted at every ref read/write. All stored values are int8-
        # representable by construction, so this is lossless.
        self.cdtype = compute_dtype or soft.dtype

    def _ld(self, v):
        return v.astype(self.cdtype) if v.dtype != self.cdtype else v

    def _st(self, v, ref_dtype):
        return v.astype(ref_dtype) if v.dtype != ref_dtype else v

    # soft slot accessors: node of size `length` reads rows [length, 2*length)
    def _soft_in(self, length):
        return self._ld(self.soft[pl.ds(length, length), :])

    def _soft_halves(self, length):
        half = length // 2
        a = self._ld(self.soft[pl.ds(length, half), :])
        b = self._ld(self.soft[pl.ds(length + half, half), :])
        return a, b

    def _write_child(self, length, val):
        # child slot = rows [length/2, length)
        self.soft[pl.ds(length // 2, length // 2), :] = self._st(
            val, self.soft.dtype
        )

    def _emit(self, block):
        rows = block.shape[0]
        self.mesg[pl.ds(self.moff, rows), :] = block.astype(self.mesg.dtype)
        self.moff += rows

    def node(self, node: Node, hoff: int, safe: bool, cabs=None,
             need_hard: bool = True):
        """Emit ops for `node`; on return, hard rows [hoff, hoff+len) hold
        the node's codeword estimate (only if ``need_hard``). ``safe``:
        the node's input slot provably contains no -128 (f-produced
        slots).

        ``cabs``: the input slot's |value| array, handed down by a parent
        f — EXACT because an f output's magnitude is the min it computed
        (``|sign(ab)*m| = m``, zeros included: a or b zero ⇒ the guarded
        min is zero too). Consumers (the child's own f, spc) skip their
        abs ops; ~2 VPU ops saved per f whose parent was an f.

        ``need_hard``: whether any ancestor consumes this node's hard
        estimate. A node's hard feeds only its parent's g (left child —
        always needed) or its parent's combine (right child — needed iff
        the PARENT's hard is). For ``output="u"`` kernels the root's hard
        is dead, so every combine and hard store on the right spine is
        elided — pure dead-code removal, bit-exactness untouched."""
        length = 1 << node.level
        kind = node.kind
        if kind == "rate0":
            if need_hard:
                self.hard[pl.ds(hoff, length), :] = jnp.ones_like(
                    self.hard[pl.ds(hoff, length), :]
                )
            return
        if kind == "rate1":
            hard = _isign(self._soft_in(length))
            if need_hard:
                self.hard[pl.ds(hoff, length), :] = self._st(
                    hard, self.hard.dtype
                )
            self._emit(_transform_value(hard))
            return
        if kind == "rep":
            acc = _fold(self._soft_in(length), _sat_add)
            bit = _isign(acc)
            self._emit(bit)
            if need_hard:
                self.hard[pl.ds(hoff, length), :] = jnp.broadcast_to(
                    self._st(bit, self.hard.dtype), (length, bit.shape[1])
                )
            return
        if kind == "spc":
            soft = self._soft_in(length)
            hard = _decide(soft)
            parity = _fold(hard, jnp.multiply)
            sabs = cabs if cabs is not None else jnp.abs(_guard(soft, safe))
            weak = _fold(sabs, jnp.minimum)
            # flip ties (sabs == weak) by parity, mask-free: sabs - weak is
            # a non-negative integer, so min(sabs - weak, 1) is 0 exactly
            # on ties and 1 otherwise.
            not_tie = jnp.minimum(sabs - weak, jnp.asarray(1, sabs.dtype))
            one = jnp.asarray(1, hard.dtype)
            hard = hard * (not_tie + (one - not_tie) * parity)
            if need_hard:
                self.hard[pl.ds(hoff, length), :] = self._st(
                    hard, self.hard.dtype
                )
            self._emit(_transform_value(hard)[1:])
            return
        half = length // 2
        if kind == "rate0_right":
            a, b = self._soft_halves(length)
            self._write_child(length, _sat_add(a, b))
            self.node(node.right, hoff, safe=False, need_hard=need_hard)
            if need_hard:
                hr = self.hard[pl.ds(hoff, half), :]
                self.hard[pl.ds(hoff + half, half), :] = hr
            return
        if kind == "rate1_comb":
            a, b = self._soft_halves(length)
            ap, bp = _guard(a, safe), _guard(b, safe)
            fabs = self._f_abs(ap, bp, cabs, half)
            self._write_child(length, _isign(a * b) * fabs)
            self.node(node.left, hoff, safe=True, cabs=fabs)
            hl = self._ld(self.hard[pl.ds(hoff, half), :])
            hr = _isign(_sat_g(hl, ap, b))
            self._emit(_transform_value(hr))
            if need_hard:
                self.hard[pl.ds(hoff, half), :] = self._st(
                    hl * hr, self.hard.dtype
                )
                self.hard[pl.ds(hoff + half, half), :] = self._st(
                    hr, self.hard.dtype
                )
            return
        if kind == "branch":
            a, b = self._soft_halves(length)
            ap, bp = _guard(a, safe), _guard(b, safe)
            fabs = self._f_abs(ap, bp, cabs, half)
            self._write_child(length, _isign(a * b) * fabs)
            self.node(node.left, hoff, safe=True, cabs=fabs)
            hl = self._ld(self.hard[pl.ds(hoff, half), :])
            self._write_child(length, _sat_g(hl, ap, b))
            self.node(node.right, hoff + half, safe=False,
                      need_hard=need_hard)
            if need_hard:
                hr = self._ld(self.hard[pl.ds(hoff + half, half), :])
                self.hard[pl.ds(hoff, half), :] = self._st(
                    hl * hr, self.hard.dtype
                )
            return
        raise AssertionError(kind)  # pragma: no cover

    @staticmethod
    def _f_abs(ap, bp, cabs, half):
        """min(|a'|, |b'|) for the f op, reusing the parent's cached
        magnitudes when available (they ARE |a'|/|b'| of this slot)."""
        if cabs is not None:
            return jnp.minimum(cabs[:half], cabs[half:])
        return jnp.minimum(jnp.abs(ap), jnp.abs(bp))


class _SsaBuilder:
    """Value-passing (SSA) kernel body: no soft-pyramid/hard-stack scratch
    at all — node inputs and hard estimates flow through the trace-time
    recursion as values, and Mosaic allocates registers/spills with exact
    lifetimes. Removes the explicit VMEM store+load round trip that the
    scratch builder pays at every node boundary; hard assembly uses row
    concatenation instead of stack updates. Same sign-free ops, same
    saturation order — bit-exact with the scratch kernel (tested)."""

    def __init__(self, mesg, compute_dtype, collect_u: bool = False):
        # mesg may be None: consumers that only need the cw track (the
        # fused Monte-Carlo step kernel) skip the u-output stores.
        self.mesg = mesg
        self.moff = 0
        self.cdtype = compute_dtype
        # collect_u: accumulate the FULL u-domain estimate (frozen slots
        # +1) as blocks in u order; ``concat(u_parts)`` after node() is
        # the decoder's (N, BT) leaf estimate — the reference decoder's
        # output domain with frozen slots kept (the non-systematic step
        # kernel compares it against the drawn u-domain message). Costs
        # nothing but the concat: every block already exists.
        self.collect_u = collect_u
        self.u_parts: list = []

    def _emit(self, block):
        if self.mesg is None:
            return
        rows = block.shape[0]
        self.mesg[pl.ds(self.moff, rows), :] = block.astype(self.mesg.dtype)
        self.moff += rows

    def _u(self, *blocks):
        if self.collect_u:
            self.u_parts.extend(blocks)

    def u_full(self):
        assert self.collect_u and self.u_parts
        return (self.u_parts[0] if len(self.u_parts) == 1
                else jnp.concatenate(self.u_parts, axis=0))

    def node(self, node: Node, soft, safe: bool, cabs=None,
             need_hard: bool = True, need_cw: bool = False):
        """Returns ``(hard, cw)`` — the node's hard estimate and its
        **re-encoded codeword estimate** ``T(u_segment)`` (frozen slots
        forced to +1, the testbench re-encode semantics
        ``testbench.cc:177-183``); each is None unless requested.

        ``cw`` is NOT the internal hard estimate: the two differ whenever
        zero-LLR ties propagate zeros through the hard track (DESIGN.md
        §5's root-hard rejection). Carrying the cw track through the
        recursion fuses the systematic/codeword epilogue into the kernel
        — node-wise ``cw = concat(cw_l * cw_r, cw_r)`` with leaf
        transforms — at a fraction of the XLA re-encode's HBM cost,
        while staying bit-exact with ``encode(code, u)``."""
        kind = node.kind
        if kind == "rate0":
            ones = (jnp.ones_like(soft)
                    if (need_hard or need_cw or self.collect_u) else None)
            self._u(ones)
            return (ones if need_hard else None,
                    ones if need_cw else None)
        if kind == "rate1":
            hard = _isign(soft)
            t = _transform_value(hard)
            self._emit(t)
            self._u(t)
            # all slots are info bits: u_segment = t, cw = T(t)
            return (hard if need_hard else None,
                    _transform_value(t) if need_cw else None)
        if kind == "rep":
            bit = _isign(_fold(soft, _sat_add))
            self._emit(bit)
            self._u(jnp.ones_like(soft[:-1]), bit)
            # u_segment = [+1,...,+1,bit] → T is broadcast(bit), exactly
            # the hard estimate (holds for bit == 0 too)
            bc = (jnp.broadcast_to(bit, soft.shape)
                  if (need_hard or need_cw) else None)
            return (bc if need_hard else None, bc if need_cw else None)
        if kind == "spc":
            hard = _decide(soft)
            parity = _fold(hard, jnp.multiply)
            sabs = cabs if cabs is not None else jnp.abs(_guard(soft, safe))
            weak = _fold(sabs, jnp.minimum)
            not_tie = jnp.minimum(sabs - weak, jnp.asarray(1, sabs.dtype))
            one = jnp.asarray(1, hard.dtype)
            hard = hard * (not_tie + (one - not_tie) * parity)
            v = _transform_value(hard)
            self._emit(v[1:])
            self._u(jnp.ones_like(v[:1]), v[1:])
            cw = None
            if need_cw:
                # u_segment = [+1 (frozen), v_1..v_{L-1}]
                cw = _transform_value(
                    jnp.concatenate([jnp.ones_like(v[:1]), v[1:]], axis=0))
            return (hard if need_hard else None, cw)
        half = soft.shape[0] // 2
        a, b = soft[:half], soft[half:]
        if kind == "rate0_right":
            self._u(jnp.ones_like(a))  # all-frozen left half, in u order
            hr, cwr = self.node(node.right, _sat_add(a, b), safe=False,
                                need_hard=need_hard, need_cw=need_cw)
            # left half all-frozen: u_lo = ones → cw = [cw_r, cw_r]
            return (jnp.concatenate([hr, hr], axis=0) if need_hard else None,
                    jnp.concatenate([cwr, cwr], axis=0) if need_cw else None)
        ap, bp = _guard(a, safe), _guard(b, safe)
        fabs = _KernelBuilder._f_abs(ap, bp, cabs, half)
        hl, cwl = self.node(node.left, _isign(a * b) * fabs, safe=True,
                            cabs=fabs, need_cw=need_cw)
        if kind == "rate1_comb":
            hr = _isign(_sat_g(hl, ap, b))
            t = _transform_value(hr)
            self._emit(t)
            self._u(t)
            cw = None
            if need_cw:
                cwr = _transform_value(t)
                cw = jnp.concatenate([cwl * cwr, cwr], axis=0)
            return (jnp.concatenate([hl * hr, hr], axis=0)
                    if need_hard else None, cw)
        if kind == "branch":
            hr, cwr = self.node(node.right, _sat_g(hl, ap, b), safe=False,
                                need_hard=need_hard, need_cw=need_cw)
            return (jnp.concatenate([hl * hr, hr], axis=0)
                    if need_hard else None,
                    jnp.concatenate([cwl * cwr, cwr], axis=0)
                    if need_cw else None)
        raise AssertionError(kind)  # pragma: no cover


def _ssa_decoder_kernel(tree: Node, compute_dtype, llr_ref, mesg_ref):
    b = _SsaBuilder(mesg_ref, compute_dtype)
    b.node(tree, llr_ref[...].astype(compute_dtype), safe=False,
           need_hard=False)


def _ssa_decoder_kernel_cw(tree: Node, compute_dtype, llr_ref, mesg_ref,
                           cw_ref):
    """Whole-code SSA kernel that also emits the re-encoded codeword
    estimate — the fused in-VMEM replacement for the XLA re-encode
    epilogue (``testbench.cc:177-183``). Measured ~5x cheaper end-to-end
    for systematic output at N=8192 than decode-u + XLA re-encode."""
    b = _SsaBuilder(mesg_ref, compute_dtype)
    _, cw = b.node(tree, llr_ref[...].astype(compute_dtype), safe=False,
                   need_hard=False, need_cw=True)
    cw_ref[...] = cw.astype(cw_ref.dtype)


def _fused_f_soft(psoft_ref, cdtype):
    """In-kernel f of the PARENT's soft slot: returns the child's
    ``(soft, cabs)`` pair — exactly the ops the enclosing XLA recursion
    would run (``polar_decoder.hh:28-35`` semantics, sign-free form).
    The parent slot may contain -128 (``safe=False`` guards); the output
    is f-produced, so the child body runs ``safe=True`` with the
    cached-abs handoff (its own abs/guard ops vanish — the same exact
    elision the in-kernel parent f's give their children)."""
    half = psoft_ref.shape[0] // 2
    a = psoft_ref[pl.ds(0, half), :].astype(cdtype)
    b = psoft_ref[pl.ds(half, half), :].astype(cdtype)
    ap, bp = _guard(a, False), _guard(b, False)
    fabs = jnp.minimum(jnp.abs(ap), jnp.abs(bp))
    return _isign(a * b) * fabs, fabs


def _subtree_entry(tree: Node, b: _SsaBuilder, fuse_f: bool, llr_ref,
                   compute_dtype, **node_kw):
    """Shared entry of the SSA subtree kernels: load (and optionally
    parent-f) the input slot, then run the recursion."""
    if fuse_f:
        soft, cabs = _fused_f_soft(llr_ref, compute_dtype)
        return b.node(tree, soft, safe=True, cabs=cabs, **node_kw)
    return b.node(tree, llr_ref[...].astype(compute_dtype), safe=False,
                  **node_kw)


def _ssa_subtree_kernel(tree: Node, compute_dtype, fuse_f, llr_ref,
                        mesg_ref, hard_ref):
    """SSA twin of _subtree_kernel: the hard estimate IS needed (the
    enclosing XLA recursion's g/combine consume it), returned as the
    recursion's value and stored once."""
    b = _SsaBuilder(mesg_ref, compute_dtype)
    hard, _ = _subtree_entry(tree, b, fuse_f, llr_ref, compute_dtype,
                             need_hard=True)
    hard_ref[...] = hard.astype(hard_ref.dtype)


def _ssa_subtree_kernel_cw(tree: Node, compute_dtype, fuse_f, llr_ref,
                           mesg_ref, hard_ref, cw_ref):
    """Subtree kernel emitting u, hard AND the codeword-estimate track —
    used by the hybrid decoder's fused systematic/codeword output (the
    XLA upper levels combine per-subtree cw blocks node-wise instead of
    re-encoding the whole u vector)."""
    b = _SsaBuilder(mesg_ref, compute_dtype)
    hard, cw = _subtree_entry(tree, b, fuse_f, llr_ref, compute_dtype,
                              need_hard=True, need_cw=True)
    hard_ref[...] = hard.astype(hard_ref.dtype)
    cw_ref[...] = cw.astype(cw_ref.dtype)


def _ssa_subtree_kernel_cw_nou(tree: Node, compute_dtype, fuse_f, llr_ref,
                               hard_ref, cw_ref):
    """``_ssa_subtree_kernel_cw`` without the u output: for
    ``output="systematic"``/``"codeword"`` hybrid decodes the message
    blocks are dead — skipping their stores drops the (k, tile) VMEM
    output block and the (k, B) HBM write (the margin that OOM'd the
    m15 front's kl13-t128/kl12-t256 subtree kernels inside fori_loop
    bodies: 16.23M/16.11M scoped vs the 16M limit)."""
    b = _SsaBuilder(None, compute_dtype)
    hard, cw = _subtree_entry(tree, b, fuse_f, llr_ref, compute_dtype,
                              need_hard=True, need_cw=True)
    hard_ref[...] = hard.astype(hard_ref.dtype)
    cw_ref[...] = cw.astype(cw_ref.dtype)


def _gfused_child_soft(psoft_ref, hardl_ref, cdtype):
    """In-kernel g of the PARENT's soft slot with the left child's hard
    estimate: the right child's input (``polar_decoder.hh:36-43``
    semantics, sign-free form). The parent slot may hold -128 (guard on
    the first half only, exactly like the XLA ``madd``)."""
    half = psoft_ref.shape[0] // 2
    a = psoft_ref[pl.ds(0, half), :].astype(cdtype)
    b = psoft_ref[pl.ds(half, half), :].astype(cdtype)
    hl = hardl_ref[...].astype(cdtype)
    return hl, _sat_g(hl, _guard(a, False), b)


def _ssa_subtree_kernel_g(tree: Node, compute_dtype, psoft_ref, hardl_ref,
                          mesg_ref, hard_ref):
    """Right-child kernel with the parent's g AND combine fused in:
    input = parent soft (2len rows) + the left child's hard estimate;
    output = the PARENT's combined hard ``[hl*hr, hr]`` (2len rows).
    The enclosing XLA level keeps nothing but array routing."""
    b = _SsaBuilder(mesg_ref, compute_dtype)
    hl, soft = _gfused_child_soft(psoft_ref, hardl_ref, compute_dtype)
    hr, _ = b.node(tree, soft, safe=False, need_hard=True)
    half = hr.shape[0]
    hard_ref[pl.ds(0, half), :] = (hl * hr).astype(hard_ref.dtype)
    hard_ref[pl.ds(half, half), :] = hr.astype(hard_ref.dtype)


def _ssa_subtree_kernel_g_cw(tree: Node, compute_dtype, psoft_ref,
                             hardl_ref, cwl_ref, mesg_ref, hard_ref,
                             cw_ref):
    b = _SsaBuilder(mesg_ref, compute_dtype)
    hl, soft = _gfused_child_soft(psoft_ref, hardl_ref, compute_dtype)
    hr, cwr = b.node(tree, soft, safe=False, need_hard=True, need_cw=True)
    half = hr.shape[0]
    cwl = cwl_ref[...].astype(compute_dtype)
    hard_ref[pl.ds(0, half), :] = (hl * hr).astype(hard_ref.dtype)
    hard_ref[pl.ds(half, half), :] = hr.astype(hard_ref.dtype)
    cw_ref[pl.ds(0, half), :] = (cwl * cwr).astype(cw_ref.dtype)
    cw_ref[pl.ds(half, half), :] = cwr.astype(cw_ref.dtype)


def _ssa_subtree_kernel_g_cw_nou(tree: Node, compute_dtype, psoft_ref,
                                 hardl_ref, cwl_ref, hard_ref, cw_ref):
    b = _SsaBuilder(None, compute_dtype)
    hl, soft = _gfused_child_soft(psoft_ref, hardl_ref, compute_dtype)
    hr, cwr = b.node(tree, soft, safe=False, need_hard=True, need_cw=True)
    half = hr.shape[0]
    cwl = cwl_ref[...].astype(compute_dtype)
    hard_ref[pl.ds(0, half), :] = (hl * hr).astype(hard_ref.dtype)
    hard_ref[pl.ds(half, half), :] = hr.astype(hard_ref.dtype)
    cw_ref[pl.ds(0, half), :] = (cwl * cwr).astype(cw_ref.dtype)
    cw_ref[pl.ds(half, half), :] = cwr.astype(cw_ref.dtype)


def _decoder_kernel(tree: Node, n: int, compute_dtype, llr_ref, mesg_ref,
                    soft, hard):
    soft[pl.ds(n, n), :] = llr_ref[...].astype(soft.dtype)
    b = _KernelBuilder(soft, hard, mesg_ref, compute_dtype)
    # u-output kernel: the root's hard estimate is dead — elide the whole
    # right spine's combines and hard stores
    b.node(tree, 0, safe=False, need_hard=False)


def _subtree_kernel(tree: Node, n: int, compute_dtype, llr_ref, mesg_ref,
                    hard_ref, soft, hard):
    """Like _decoder_kernel, but the hard estimate is an output (needed by
    the enclosing XLA recursion's g/combine steps). The builder works in
    the compute dtype scratch; outputs are stored int8 (hard values are
    in {-1,0,1}) to minimize VMEM and HBM traffic."""
    soft[pl.ds(n, n), :] = llr_ref[...].astype(soft.dtype)
    b = _KernelBuilder(soft, hard, mesg_ref, compute_dtype)
    b.node(tree, 0, safe=False)
    hard_ref[...] = hard[...].astype(hard_ref.dtype)


def make_subtree_decoder(
    tree: Node,
    *,
    frame_tile: int = 256,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    style: str = "ssa",
    emit_cw: bool = False,
    emit_u: bool = True,
    layout: str = "frame",
    fuse: str | None = None,
    vmem_limit_mb: int | None = None,
):
    """Pallas kernel for ONE pruned-tree node: used by the hybrid decoder.

    Returns ``fn(soft (B, len)) -> (u (B, mesg_bits), hard (B, len))``
    where ``soft`` is the node's input LLR slot. ``B`` must be a multiple
    of ``frame_tile`` (the hybrid wrapper pads the whole batch once).
    The enclosing XLA recursion handles levels above; this keeps VMEM
    bounded (one subtree's live set, not the whole code's), so
    arbitrarily large N decode with kernel-resident subtrees.

    ``style``: ``"ssa"`` (default — value-passing body, measured faster)
    or ``"scratch"`` (explicit VMEM pyramid). Bit-identical outputs.

    ``emit_cw`` (SSA only): also return the subtree's re-encoded
    codeword-estimate block → ``(u, hard, cw)``; the hybrid's fused
    systematic/codeword output combines these node-wise in XLA instead
    of re-encoding the full u vector (``testbench.cc:177-183``
    semantics, bit-exact).

    ``emit_u=False`` (SSA + emit_cw only): drop the u output →
    ``(hard, cw)``; used when the caller's output mode never reads the
    message blocks (``"systematic"``/``"codeword"``).

    ``layout``: ``"frame"`` (default) takes/returns frame-major
    ``(B, len)`` arrays (two transposes around the kernel's native
    element-major tiles); ``"lane"`` takes/returns element-major
    ``(len, B)`` directly — the zero-transpose path used by the
    lane-major hybrid decoder.

    ``fuse`` (SSA only):

    * ``"f"`` — the kernel's input is the PARENT node's soft slot
      (``2*len`` rows) and the parent's f op runs in-kernel feeding the
      subtree via the cached-abs handoff — one fewer XLA pass per
      left-descend call site, and the fused f gets the exact abs
      elision. Same outputs as unfused.
    * ``"g"`` — right-child fusion: inputs are the parent's soft slot
      (``2*len`` rows) plus the left child's hard estimate (``len``
      rows; plus its cw block when ``emit_cw``); the parent's g AND
      combine run in-kernel, and the hard/cw outputs are the PARENT's
      combined ``2*len``-row blocks — the enclosing XLA level keeps
      nothing but routing.

    Both are bit-exact (the fused ops are op-identical to the XLA ones).
    """
    n = 1 << tree.level
    k = tree.mesg_bits
    if k < 1:
        raise ValueError("kernelize only nodes that emit message bits")
    if not emit_u and not (style == "ssa" and emit_cw):
        raise ValueError("emit_u=False requires the SSA style with emit_cw")
    if fuse not in (None, "f", "g"):
        raise ValueError(f"unknown fuse mode {fuse!r}")
    if fuse and style != "ssa":
        raise ValueError("fuse requires the SSA kernel style")
    scratch_shapes = []
    if style == "ssa":
        if fuse == "g":
            if emit_cw:
                body = _ssa_subtree_kernel_g_cw if emit_u \
                    else _ssa_subtree_kernel_g_cw_nou
            else:
                body = _ssa_subtree_kernel_g
            kernel = functools.partial(body, tree, compute_dtype)
        else:
            if emit_cw:
                body = _ssa_subtree_kernel_cw if emit_u \
                    else _ssa_subtree_kernel_cw_nou
            else:
                body = _ssa_subtree_kernel
            kernel = functools.partial(body, tree, compute_dtype,
                                       fuse == "f")
    elif style == "scratch":
        if emit_cw:
            raise ValueError("emit_cw requires the SSA kernel style")
        kernel = functools.partial(_subtree_kernel, tree, n, compute_dtype)
        scratch_shapes = [
            pltpu.VMEM((2 * n, frame_tile), compute_dtype),  # soft pyramid
            pltpu.VMEM((n, frame_tile), compute_dtype),      # hard stack
        ]
    else:
        raise ValueError(f"unknown kernel style {style!r}")

    # input row counts: parent soft for fused modes; g adds the left
    # child's hard (and cw) blocks
    if fuse == "g":
        in_rows = (2 * n, n) + ((n,) if emit_cw else ())
    elif fuse == "f":
        in_rows = (2 * n,)
    else:
        in_rows = (n,)
    o = 2 * n if fuse == "g" else n   # hard/cw outputs are combined for g
    out_rows = ((k,) if emit_u else ()) + (o, o)[:1 + bool(emit_cw)]

    def call(*arrs_t):  # element-major (rows, B) arrays
        bt = frame_tile
        grid = arrs_t[0].shape[1] // bt
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, bt), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
                for rows in in_rows
            ],
            out_specs=tuple(
                pl.BlockSpec((rows, bt), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
                for rows in out_rows
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, arrs_t[0].shape[1]), jnp.int8)
                for rows in out_rows
            ),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
                if interpret else ("parallel",),
                # raises (or caps) Mosaic's scoped-VMEM budget — the
                # default 16M limit is below the physical VMEM and the
                # fused kl13-t128 kernels need ~18M (receipt fusef1)
                vmem_limit_bytes=(vmem_limit_mb << 20)
                if vmem_limit_mb else None,
            ),
            interpret=interpret,
        )(*arrs_t)

    if layout == "lane":
        def decode_lane(*arrs_t):
            for a, rows in zip(arrs_t, in_rows):
                if a.shape[0] != rows or a.shape[1] % frame_tile:
                    raise ValueError(
                        f"lane layout expects {in_rows}-row inputs with B "
                        f"a multiple of frame_tile {frame_tile}, got "
                        f"{[x.shape for x in arrs_t]}"
                    )
            return call(*arrs_t)

        return decode_lane
    if layout != "frame":
        raise ValueError(f"unknown layout {layout!r}")

    def decode(*arrs):
        if arrs[0].shape[0] % frame_tile:
            raise ValueError(
                f"batch {arrs[0].shape[0]} not a multiple of frame_tile "
                f"{frame_tile} (pad the batch once at the top level)"
            )
        return tuple(o.T for o in call(*(a.T for a in arrs)))

    return decode


def make_pallas_decoder(
    code: PolarCode,
    tree: Node | None = None,
    *,
    frame_tile: int = 256,
    compute_dtype=jnp.float32,
    storage_dtype=None,
    output_dtype=jnp.int8,
    interpret: bool = False,
    style: str = "scratch",
    output: str = "u",
    vmem_limit_mb: int | None = None,
):
    """Build the Pallas Fast-SSC decoder: LLRs ``(B, N)`` int8 → u ``(B, K)``.

    ``frame_tile`` frames are decoded per grid step (multiple of 128).
    ``B`` is padded up to a multiple of ``frame_tile`` internally.
    Bit-exact with the reference int8 decoder (saturation semantics carried
    in float — exact for |x| <= 256).

    ``storage_dtype`` (default = ``compute_dtype``): dtype of the VMEM
    soft-pyramid/hard-stack scratch. ``jnp.int8`` quarters scratch VMEM
    (all stored values are int8-representable), letting whole-code
    pyramids fit at larger N at the cost of per-op converts.

    ``style``: ``"scratch"`` (explicit VMEM soft-pyramid/hard-stack) or
    ``"ssa"`` (value-passing body, compiler-managed lifetimes — no
    scratch buffers). Bit-identical outputs.

    ``output`` (SSA style only for non-``"u"``): ``"u"`` (default),
    ``"systematic"``, ``"codeword"``, or ``"both"`` — same contract as
    :func:`~polar_tpu.decode.fastssc.make_fastssc_decoder`. Non-u modes
    fuse the re-encode into the kernel via the codeword-estimate track
    (bit-exact with ``encode(code, u)``, incl. zero-LLR tie zeros),
    replacing the XLA re-encode epilogue and its HBM round trips.
    """
    if tree is None:
        tree = compile_code(code)
    n, k = code.N, code.K
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    if style not in ("scratch", "ssa"):
        raise ValueError(f"unknown kernel style {style!r}")
    if output not in ("u", "systematic", "codeword", "both"):
        raise ValueError(f"unknown output mode {output!r}")
    if output != "u" and style != "ssa":
        raise ValueError("non-u output modes require the SSA kernel style")
    storage_dtype = storage_dtype or compute_dtype
    want_cw = output != "u"

    if style == "ssa":
        body = _ssa_decoder_kernel_cw if want_cw else _ssa_decoder_kernel
        kernel = functools.partial(body, tree, compute_dtype)
        scratch_shapes = []
    else:
        kernel = functools.partial(_decoder_kernel, tree, n, compute_dtype)
        scratch_shapes = [
            pltpu.VMEM((2 * n, frame_tile), storage_dtype),  # soft pyramid
            pltpu.VMEM((n, frame_tile), storage_dtype),      # hard stack
        ]

    out_rows = (k, n) if want_cw else (k,)

    def call(llr_t):  # (N, B) element-major
        bt = frame_tile
        grid = llr_t.shape[1] // bt
        specs = tuple(
            pl.BlockSpec((rows, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for rows in out_rows
        )
        shapes = tuple(
            jax.ShapeDtypeStruct((rows, llr_t.shape[1]), output_dtype)
            for rows in out_rows
        )
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((n, bt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=specs if want_cw else specs[0],
            out_shape=shapes if want_cw else shapes[0],
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
                if interpret else ("parallel",),
                vmem_limit_bytes=(vmem_limit_mb << 20)
                if vmem_limit_mb else None,
            ),
            interpret=interpret,
        )(llr_t)
        return out

    info = np.flatnonzero(code.frozen == 0)

    def decode(llrs):
        if llrs.ndim != 2:
            raise ValueError("pallas decoder expects (batch, N) LLRs")
        b = llrs.shape[0]
        pad = (-b) % frame_tile
        if pad:
            llrs = jnp.pad(llrs, ((0, pad), (0, 0)))
        if not want_cw:
            return call(llrs.T).T[:b]
        mesg_t, cw_t = call(llrs.T)
        if output == "systematic":
            return cw_t.T[:b, info]
        if output == "codeword":
            return cw_t.T[:b]
        return mesg_t.T[:b], cw_t.T[:b]

    def decode_lane_major(llr_t):
        """Zero-transpose entry point: LLRs ``(N, B)`` → u ``(K, B)``.

        This is the kernel's native element-major layout — the analog of
        the reference's interleaved lane-major buffers
        (``testbench.cc:72``, element i of frame k at ``buf[W*i+k]``).
        Pipelines that keep frames on the minor axis end-to-end skip the
        two HBM transposes (measured ~1% at N=1024 — XLA overlaps them
        with compute — but they cost real HBM bandwidth under load).
        ``B`` must be a multiple of ``frame_tile``.
        """
        if llr_t.ndim != 2 or llr_t.shape[0] != n:
            raise ValueError(f"expected (N={n}, B) lane-major LLRs")
        if llr_t.shape[1] % frame_tile:
            raise ValueError(
                f"lane-major batch {llr_t.shape[1]} must be a multiple of "
                f"frame_tile {frame_tile}"
            )
        return call(llr_t)

    decode.lane_major = decode_lane_major
    return decode
