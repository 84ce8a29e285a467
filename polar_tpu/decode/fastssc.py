"""Fast-SSC decoder: trace-time specialized, batched, XLA path.

The reference interprets a byte-code program over shape-specialized
template kernels (``/root/reference/polar_decoder.hh:131-464``). Here the
same pruned-tree recursion runs in Python at **trace time** over the
:class:`~polar_tpu.code.compiler.Node` tree, emitting one fully-unrolled
XLA computation per (N, frozen-set) — the TPU analog of
``template<int level>`` instantiation. All shapes are static; the frame
batch is the leading dimension (the analog of the SIMD lane axis, but
thousands wide instead of 32).

Node semantics are op-for-op those of ``polar_decoder.hh``:

* f / "left"       (28-35):  prod of the two input halves
* g / "right"      (36-43):  madd with the left hard partial sums
* rate0_right      (44-51):  g with implicit +1 hard → saturating add
* comb             (52-59):  hard[i] *= hard_right[i]
* rate0            (68-75):  all +1, no message
* rate1            (85-93):  elementwise sign, message = transform(hard)
* rate1_comb       (76-84):  fused g + sign + comb + transform
* rep              (94-106): saturating fold-in-half adder tree, sign bcast
* spc             (107-127): Wagner decode — decide, parity, weakest |LLR|
                             flip, message = transform(hard)[1:]

Saturation order of the int8 ops matches the reference exactly, so int8
decodes are bit-exact against the reference decoder (verified by the
oracle parity tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..code.compiler import Node, compile_code
from ..code.construction import PolarCode
from ..ops import arith
from ..ops.transform import polar_transform


def _f(inp):
    half = inp.shape[-1] // 2
    return arith.prod(inp[..., :half], inp[..., half:])


def _g(hard_left, inp):
    half = inp.shape[-1] // 2
    return arith.madd(hard_left, inp[..., :half], inp[..., half:])


def _g_rate0(inp):
    """g with an all-(+1) left half: plain saturating add (no -127 clamp),
    mirroring ``rate0_right`` (``polar_decoder.hh:44-51``)."""
    half = inp.shape[-1] // 2
    return arith.qadd(inp[..., :half], inp[..., half:])


def _rep(soft, mesg: list):
    x = soft
    while x.shape[-1] > 1:
        half = x.shape[-1] // 2
        x = arith.qadd(x[..., :half], x[..., half:])
    bit = arith.signum(x)
    mesg.append(bit)
    return jnp.broadcast_to(bit, soft.shape)


def _spc(soft, mesg: list):
    hard = arith.decide(soft)
    parity = jnp.prod(hard, axis=-1, keepdims=True).astype(hard.dtype)
    sabs = arith.qabs(soft)
    weak = jnp.min(sabs, axis=-1, keepdims=True)
    hard = arith.flip(hard, parity, weak, sabs)
    t = polar_transform(hard)
    mesg.append(t[..., 1:])
    return hard


def _rate1(soft, mesg: list):
    hard = arith.signum(soft)
    mesg.append(polar_transform(hard))
    return hard


def _decode_node(node: Node, soft, mesg: list):
    """Returns this node's hard codeword estimate; appends message blocks
    in emission order (in-order tree traversal, ``polar_decoder.hh`` msg
    cursor semantics)."""
    kind = node.kind
    if kind == "rate0":
        return jnp.ones_like(soft)
    if kind == "rate1":
        return _rate1(soft, mesg)
    if kind == "rep":
        return _rep(soft, mesg)
    if kind == "spc":
        return _spc(soft, mesg)
    if kind == "rate0_right":
        hard_r = _decode_node(node.right, _g_rate0(soft), mesg)
        return jnp.concatenate([hard_r, hard_r], axis=-1)
    if kind == "rate1_comb":
        hard_l = _decode_node(node.left, _f(soft), mesg)
        hard_r = arith.signum(_g(hard_l, soft))
        mesg.append(polar_transform(hard_r))
        return jnp.concatenate([arith.qmul(hard_l, hard_r), hard_r], axis=-1)
    if kind == "branch":
        hard_l = _decode_node(node.left, _f(soft), mesg)
        hard_r = _decode_node(node.right, _g(hard_l, soft), mesg)
        return jnp.concatenate([arith.qmul(hard_l, hard_r), hard_r], axis=-1)
    raise AssertionError(kind)  # pragma: no cover


def make_fastssc_decoder(code: PolarCode, tree: Node | None = None):
    """Build a jittable decoder: LLRs (..., N) → u-domain info bits (..., K).

    The returned function is pure and shape-polymorphic in the leading
    batch dimensions. Wrap it in ``jax.jit`` (or let the BER harness do
    so); it retraces only per distinct (N, frozen-set) — code construction
    is per-code and amortized, exactly like the reference's one-time
    program compilation (``testbench.cc:95-97``).
    """
    if tree is None:
        tree = compile_code(code)

    def decode(llrs):
        mesg: list = []
        _decode_node(tree, llrs, mesg)
        return jnp.concatenate(mesg, axis=-1)

    return decode
