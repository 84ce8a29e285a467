"""Program-size-diet Pallas decoder: an in-kernel Fast-SSC interpreter.

The whole-code SSA kernels (:mod:`.decoder_kernel`) emit a fully
UNROLLED Mosaic program — O(tree size) ops — which is the fastest form
at small/medium N but runs into the compile wall at the large-N
frontier: the m15 systematic decode+count kernel's serialized MLIR
exceeds the compile relay's request-size limit (receipt
``m15-decodecount-t128``), the m16 whole-code first call compiles for
~29 minutes, and m22 for 4134 s.

This module is the cure: the reference decoder's actual shape — a
byte-code program interpreted over per-level kernels
(``/root/reference/polar_decoder.hh:131-464``: a while-loop ``switch``
on opcode, each opcode fanning to a ``switch(lvl)`` ladder of
``template<int level>`` instantiations) — mapped TPU-native:

* the **step program** lives in SMEM: one int32 word per step,
  ``(pos >> subtree_level) << 16 | branch_index`` (the analog of the
  reference's ``[M, opcodes..., 255]`` byte program,
  ``polar_compiler.hh:51-58``);
* the **branch table** holds each distinct op body ONCE — per-level
  f/g/comb chain ops above ``subtree_level`` (the ``switch(lvl)``
  template ladder) and fully-unrolled SSA *subtree bodies* at or below
  it, deduplicated by frozen pattern (two level-10 subtrees with the
  same pattern share one body);
* the kernel runs ``lax.fori_loop`` over steps with a ``pl.when``
  chain over the branch table — program size is O(distinct bodies),
  not O(tree size).

**Measured limits (round-4 receipts — read before reaching for this
kernel):** the compile-time claim holds (m15 decode+count builds in
89 s where the unrolled twin exceeds the compile relay's request
size), but once the loop body's total code outgrows the core's
instruction buffer every fori_loop iteration pays ~0.6–0.76 µs per
TABLE ARM regardless of which arm is taken (receipts
``m15-interpablate-real``/``-cheap`` identical to 0.01%;
``m15-interparms-k{4,16,64,118}``: k≤16 costs exactly the taken arm,
beyond that cost grows linearly with the table). Small-table kernels
branch for real (``switchprobe*`` receipts). Consequently the
interpreter loses to the unrolled kernels wherever those compile
(m13: 1.12M vs 3.56M fps; m15: 4.6K).

**The deep-frontier niche this module originally claimed ("fast
first-call compiles at m ≥ 20, probes past the unrolled ladder's
compile wall") was put to the receipt test in round 5 and REFUTED:**
the m23 interp-kl17 hybrid spent ~85 minutes in local trace/lowering
(RSS 24 GB) before the remote compile helper was SIGKILLed
(`m23-probe-interpkl17` r5) — the per-site interp kernels at kl17
multiply distinct branch-table bodies instead of shrinking the
program; and the m17 whole-code interp decoders OOM with a scoped
need that TRACKS the VMEM cap (+~2M over any budget: 112M at cap
110, 117.9M at cap 116 — receipts `m17-interp-{u,cw}-kl12-v1*`).
What survives, by receipt: fast compiles and bit-exact execution at
the sizes below the streaming wall (m13 builds 24 s, m15 89 s,
m15/m16 decode+count where the unrolled twin cannot compile at all)
— a correctness/compile-time tool, not a frontier path. The m≥20
frontier runs on the unrolled kl-hybrid ladder (`m22-probe`: kl13,
4134 s first call).

**VMEM bound on the subtree level:** chain ops are chunked
(``_CHAIN_CHUNK_ROWS``) so their live sets stay bounded at any N, but
SUBTREE bodies cannot be chunked (the transform couples their rows) —
a level-``kl`` SSA body's value chain is the whole-code kernel's at
N=2^kl. At m16 the kl10 bodies' spill already exceeds the chip
(receipts ``m16-interp-decodecount-kl10`` r4: scoped 136M > 128M
physical; kl8 fits and runs 1,801 fps), so deep-frontier configs keep
``subtree_level`` small enough that one body's live set fits next to
the (2N, T) pyramid — the step-count-vs-body-size trade the
instruction-streaming wall already pushes the same direction.

State is the reference's, verbatim: a **soft pyramid** VMEM scratch
(level-ℓ LLR slot = rows ``[2^ℓ, 2^(ℓ+1))`` — static offsets, exactly
``polar_decoder.hh:128``'s layout) and **absolutely-positioned**
hard/codeword/u buffers (N rows; node at position p owns rows
``[p, p+2^level)``, the pointer arithmetic of
``polar_decoder.hh:203-204`` resolved at trace time into the step
words). All dynamic row offsets are multiples of ``2^subtree_level``
(≥ 256), so every dynamic VMEM access is tile-aligned.

Same sign-free integer-exact ops as the SSA kernels (subtree bodies
ARE :class:`~.decoder_kernel._SsaBuilder` bodies), same saturation
order — bit-exact with the reference int8 decoder and with the
unrolled kernels (pinned by ``tests/test_interp_kernel.py``).

Dead-code elisions carry over at *program* granularity: for ``u``
output the root's hard track is dead, so right-spine combine steps are
never emitted; all-frozen subtrees emit NO step at all (the hard/cw/u
buffers are pre-initialized to +1 — a rate-0 node's exact estimate).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...code.compiler import Node, compile_code
from ...code.construction import PolarCode
from .decoder_kernel import (_guard, _isign, _sat_add, _sat_g, _SsaBuilder)

_LEAF_KINDS = ("rate0", "rate1", "rep", "spc")


@dataclass
class _Env:
    """Kernel-side state the branch bodies close over."""

    soft: object            # (2N, T) pyramid scratch, storage dtype
    hard: object            # (N, T) int8 — internal hard estimates
    cw: object | None       # (N, T) int8 — re-encoded codeword track
    u: object | None        # (N, T) int8 — full u-domain estimate
    cdtype: object = jnp.float32
    align: int = 1          # every dynamic row offset is a multiple of
                            # min(2^subtree_level, _CHAIN_CHUNK_ROWS):
                            # step positions are multiples of
                            # 2^subtree_level (walk invariant) and chain
                            # chunk offsets of _CHAIN_CHUNK_ROWS — Mosaic
                            # can't see either through the lax.switch
                            # boundary, so ds() re-asserts the gcd

    def ds(self, start, rows):
        if not isinstance(start, (int, np.integer)):
            start = pl.multiple_of(start, self.align)
        return pl.ds(start, rows)

    def ld(self, ref, start, rows):
        return ref[self.ds(start, rows), :].astype(self.cdtype)

    def st(self, ref, start, val):
        ref[self.ds(start, val.shape[0]), :] = val.astype(ref.dtype)


# --- chain branches (the per-level template ladder) -------------------
# Each _mk_* returns make(env) -> fn(p) so the builder can key bodies
# before any ref exists; ``p`` is the step's element position (already
# scaled back from the program word). Semantics cites are the same as
# the SSA kernels': f ``polar_decoder.hh:28-35``, g ``36-43``,
# rate0_right's qadd ``44-51``, combine ``52-59``, rate0_comb ``60-67``,
# rate1_comb ``76-84``.
#
# Chain ops are ELEMENTWISE across their h rows, so they process row
# CHUNKS of at most _CHAIN_CHUNK_ROWS (a static Python loop — offsets
# stay trace-time constants relative to p). Unchunked, a level-16 f
# holds ~6 live (32768, 128) vectors and Mosaic's register allocator
# spills 64M to the scoped stack (receipt m16-interp-decodecount-kl8:
# 136M > the 128M chip); chunking bounds the live set per chunk while
# emitting identical math. grate1/subtree bodies are NOT chunked (the
# transform couples rows); they only occur at low levels.

_CHAIN_CHUNK_ROWS = 2048


def _chunks(h):
    c = min(h, _CHAIN_CHUNK_ROWS)
    return [(off, c) for off in range(0, h, c)]


def _run_program(prog_ref, n_steps, branches, kl):
    """fori_loop over step words with pl.when-chain dispatch.

    pl.when and lax.switch both branch for real in SMALL kernels
    (receipts switchprobe/switchprobe2/switchprobe3), but once the
    loop body's total code exceeds the core's instruction buffer each
    iteration pays ~0.6-0.76 us per table arm whether taken or not
    (receipts m15-interpablate-*, m15-interparms-k*) — see the module
    docstring's measured-limits note."""

    def body(i, c):
        w = prog_ref[i]
        p = (w >> 16) << kl
        if len(branches) == 1:
            branches[0](p)
        else:
            b = jnp.bitwise_and(w, 0xFFFF)
            for bi, fn in enumerate(branches):
                @pl.when(b == bi)
                def _(fn=fn):
                    fn(p)
        return c

    jax.lax.fori_loop(0, n_steps, body, jnp.int32(0))


def _mk_f(level, safe):
    s, h = 1 << level, 1 << (level - 1)

    def make(env):
        def fn(p):
            for off, c in _chunks(h):
                a = env.ld(env.soft, s + off, c)
                b = env.ld(env.soft, s + h + off, c)
                ap, bp = _guard(a, safe), _guard(b, safe)
                fabs = jnp.minimum(jnp.abs(ap), jnp.abs(bp))
                env.st(env.soft, h + off, _isign(a * b) * fabs)
            return jnp.int32(0)
        return fn
    return make


def _mk_g(level, safe):
    s, h = 1 << level, 1 << (level - 1)

    def make(env):
        def fn(p):
            for off, c in _chunks(h):
                a = env.ld(env.soft, s + off, c)
                b = env.ld(env.soft, s + h + off, c)
                hl = env.ld(env.hard, p + off, c)
                env.st(env.soft, h + off, _sat_g(hl, _guard(a, safe), b))
            return jnp.int32(0)
        return fn
    return make


def _mk_g0(level):
    # rate0_right: left half all-frozen, hard ≡ +1 → plain saturating add
    s, h = 1 << level, 1 << (level - 1)

    def make(env):
        def fn(p):
            for off, c in _chunks(h):
                a = env.ld(env.soft, s + off, c)
                b = env.ld(env.soft, s + h + off, c)
                env.st(env.soft, h + off, _sat_add(a, b))
            return jnp.int32(0)
        return fn
    return make


def _mk_comb(level, do_hard, do_cw):
    h = 1 << (level - 1)

    def make(env):
        def fn(p):
            for off, c in _chunks(h):
                if do_hard:
                    hl = env.ld(env.hard, p + off, c)
                    hr = env.ld(env.hard, p + h + off, c)
                    env.st(env.hard, p + off, hl * hr)
                if do_cw:
                    cl = env.ld(env.cw, p + off, c)
                    cr = env.ld(env.cw, p + h + off, c)
                    env.st(env.cw, p + off, cl * cr)
            return jnp.int32(0)
        return fn
    return make


def _mk_comb0(level, do_hard, do_cw):
    # rate0_comb: left half's estimate is the right half's (hl ≡ +1)
    h = 1 << (level - 1)

    def make(env):
        def fn(p):
            for off, c in _chunks(h):
                if do_hard:
                    env.hard[env.ds(p + off, c), :] = \
                        env.hard[env.ds(p + h + off, c), :]
                if do_cw:
                    env.cw[env.ds(p + off, c), :] = \
                        env.cw[env.ds(p + h + off, c), :]
            return jnp.int32(0)
        return fn
    return make


def _mk_grate1(level, safe, need_hard, want_cw, want_u):
    # rate1_comb's fused tail: g + decide + transform + combine
    # (``polar_decoder.hh:76-84``) — the left child's hard is already at
    # rows [p, p+h); writes the PARENT's combined blocks.
    s, h = 1 << level, 1 << (level - 1)

    def make(env):
        def fn(p):
            a, b = env.ld(env.soft, s, h), env.ld(env.soft, s + h, h)
            hl = env.ld(env.hard, p, h)
            hr = _isign(_sat_g(hl, _guard(a, safe), b))
            t = _transform(hr)
            if want_u:
                env.st(env.u, p + h, t)
            if need_hard:
                env.st(env.hard, p, hl * hr)
                env.st(env.hard, p + h, hr)
            if want_cw:
                cwr = _transform(t)
                cwl = env.ld(env.cw, p, h)
                env.st(env.cw, p, cwl * cwr)
                env.st(env.cw, p + h, cwr)
            return jnp.int32(0)
        return fn
    return make


def _transform(x):
    """Polar transform along rows, contiguous-slice halving form
    (identical math to :func:`.decoder_kernel._transform_value`)."""
    n = x.shape[0]
    if n == 1:
        return x
    h = n // 2
    return jnp.concatenate([_transform(x[:h] * x[h:]), _transform(x[h:])],
                           axis=0)


def _mk_body(node: Node, safe, need_hard, want_cw, want_u):
    """One step-leaf: a fully-unrolled SSA subtree body (level ≤
    ``subtree_level``) or a big pruned leaf (rate1/rep/spc above it).
    Reads the node's static soft slot, writes its absolutely-positioned
    hard/cw/u blocks at the step's dynamic position. The body is the
    value-passing :class:`_SsaBuilder` recursion — cached-abs handoff
    and all — so inside a body nothing goes through scratch."""
    s = 1 << node.level

    def make(env):
        def fn(p):
            b = _SsaBuilder(None, env.cdtype, collect_u=want_u)
            soft = env.ld(env.soft, s, s)
            hard, cw = b.node(node, soft, safe=safe, need_hard=need_hard,
                              need_cw=want_cw)
            if need_hard:
                env.st(env.hard, p, hard)
            if want_cw:
                env.st(env.cw, p, cw)
            if want_u:
                env.st(env.u, p, b.u_full())
            return jnp.int32(0)
        return fn
    return make


@dataclass
class _Program:
    branches: dict = field(default_factory=dict)  # key -> (idx, make)
    steps: list = field(default_factory=list)     # (branch_idx, pos)
    ones_init: bool = False                       # any rate-0 skipped?

    def step(self, key, make, pos):
        if key not in self.branches:
            self.branches[key] = (len(self.branches), make)
        self.steps.append((self.branches[key][0], pos))

    def words(self, kl: int) -> np.ndarray:
        # 16-bit branch index + 15-bit scaled position (m=20+ tables
        # exceed 256 branches; positions are multiples of 2^kl)
        assert len(self.branches) < (1 << 16), "branch table overflow"
        assert all(pos >> kl < (1 << 15) for _, pos in self.steps), \
            "scaled position overflow — raise subtree_level"
        return np.asarray(
            [(pos >> kl) << 16 | idx for idx, pos in self.steps], np.int32)

    def makes(self):
        return [mk for _, (_, mk) in sorted(
            self.branches.items(), key=lambda kv: kv[1][0])]


def _build_program(tree: Node, kl: int, want_cw: bool, want_u: bool,
                   root_need_hard: bool = False) -> _Program:
    """Trace-time tree walk → step program + branch table. The walk is
    the reference compiler's recursion (``polar_compiler.hh:21-49``)
    with the decoder's pointer bookkeeping resolved into per-step
    positions, plus the dead-code elisions of the unrolled kernels:
    right-spine combines are skipped when the root's hard is dead, and
    all-frozen nodes emit nothing (pre-initialized +1 buffers)."""
    prog = _Program()

    def walk(node: Node, pos: int, safe: bool, need_hard: bool):
        if node.level <= kl or node.kind in _LEAF_KINDS:
            if node.kind == "rate0":
                prog.ones_init = True   # covered by the +1 pre-init
                return
            key = ("body", node, safe, need_hard, want_cw, want_u)
            prog.step(key, _mk_body(node, safe, need_hard, want_cw,
                                    want_u), pos)
            return
        lv, half = node.level, 1 << (node.level - 1)
        if node.kind == "branch":
            prog.step(("f", lv, safe), _mk_f(lv, safe), pos)
            walk(node.left, pos, True, True)
            prog.step(("g", lv, safe), _mk_g(lv, safe), pos)
            walk(node.right, pos + half, False, need_hard)
            if need_hard or want_cw:
                key = ("comb", lv, need_hard, want_cw)
                prog.step(key, _mk_comb(lv, need_hard, want_cw), pos)
        elif node.kind == "rate0_right":
            prog.ones_init = True       # all-frozen left half
            prog.step(("g0", lv), _mk_g0(lv), pos)
            walk(node.right, pos + half, False, need_hard)
            if need_hard or want_cw:
                key = ("comb0", lv, need_hard, want_cw)
                prog.step(key, _mk_comb0(lv, need_hard, want_cw), pos)
        elif node.kind == "rate1_comb":
            prog.step(("f", lv, safe), _mk_f(lv, safe), pos)
            walk(node.left, pos, True, True)
            key = ("grate1", lv, safe, need_hard, want_cw, want_u)
            prog.step(key, _mk_grate1(lv, safe, need_hard, want_cw,
                                      want_u), pos)
        else:  # pragma: no cover
            raise AssertionError(node.kind)

    walk(tree, 0, safe=False, need_hard=root_need_hard)
    return prog


def make_interp_decoder(
    code: PolarCode,
    tree: Node | None = None,
    *,
    subtree_level: int = 10,
    frame_tile: int = 128,
    compute_dtype=jnp.float32,
    storage_dtype=jnp.int8,
    output: str = "u",
    output_dtype=jnp.int8,
    interpret: bool = False,
    vmem_limit_mb: int | None = None,
):
    """Interpreter-style whole-code decoder (see module docstring).

    Same contract as :func:`.decoder_kernel.make_pallas_decoder`:
    ``decode(llrs (B, N) int8) -> u (B, K)`` / codeword / systematic /
    both, plus a zero-transpose ``decode.lane_major`` entry. Bit-exact
    with every other decoder variant.

    ``subtree_level``: nodes at this level or below become unrolled SSA
    bodies (deduplicated by frozen pattern); above it, per-level chain
    steps. Smaller → smaller program, more interpreter dispatches.
    ``storage_dtype``: the soft pyramid's VMEM dtype (int8 default —
    all values are int8-representable; quarters the pyramid vs f32, the
    headroom that fits whole-code m17).
    """
    if tree is None:
        tree = compile_code(code)
    n, k = code.N, code.K
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    if output not in ("u", "systematic", "codeword", "both"):
        raise ValueError(f"unknown output mode {output!r}")
    kl = min(subtree_level, code.level)
    want_cw = output != "u"
    want_u = output in ("u", "both")
    prog = _build_program(tree, kl, want_cw, want_u)
    words_np = prog.words(kl)
    kernel = functools.partial(
        _interp_kernel_entry, prog, n, kl, compute_dtype, want_cw, want_u,
        False, None)

    out_rows = ((n,) if want_u else ()) + ((n,) if want_cw else ())
    scratch = [pltpu.VMEM((2 * n, frame_tile), storage_dtype),
               pltpu.VMEM((n, frame_tile), jnp.int8)]

    def call(llr_t):
        bt = frame_tile
        grid = llr_t.shape[1] // bt
        blk = lambda: pl.BlockSpec((n, bt), lambda i: (0, i),  # noqa: E731
                                   memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk()],
            out_specs=tuple(blk() for _ in out_rows),
            out_shape=tuple(
                jax.ShapeDtypeStruct((r, llr_t.shape[1]), jnp.int8)
                for r in out_rows),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
                if interpret else ("parallel",),
                vmem_limit_bytes=(vmem_limit_mb << 20)
                if vmem_limit_mb else None),
            interpret=interpret,
        )(jnp.asarray(words_np), llr_t)
        return out

    info_np = np.flatnonzero(code.frozen == 0)

    def decode(llrs):
        if llrs.ndim != 2:
            raise ValueError("interp decoder expects (batch, N) LLRs")
        b = llrs.shape[0]
        pad = (-b) % frame_tile
        if pad:
            llrs = jnp.pad(llrs, ((0, pad), (0, 0)))
        out = call(llrs.T)
        if output == "u":
            return out[0][jnp.asarray(info_np), :].T[:b].astype(output_dtype)
        if output == "codeword":
            return out[0].T[:b].astype(output_dtype)
        if output == "systematic":
            return out[0][jnp.asarray(info_np), :].T[:b].astype(output_dtype)
        u_t, cw_t = out
        return (u_t[jnp.asarray(info_np), :].T[:b].astype(output_dtype),
                cw_t.T[:b].astype(output_dtype))

    def decode_lane_major(llr_t):
        """(N, B) → u (K, B) / cw (N, B) / (u, cw) — zero transposes."""
        if llr_t.ndim != 2 or llr_t.shape[0] != n:
            raise ValueError(f"expected (N={n}, B) lane-major LLRs")
        if llr_t.shape[1] % frame_tile:
            raise ValueError("lane-major batch must be a multiple of "
                             f"frame_tile {frame_tile}")
        out = call(llr_t)
        if output == "u":
            return out[0][jnp.asarray(info_np), :]
        if output == "codeword":
            return out[0]
        if output == "systematic":
            return out[0][jnp.asarray(info_np), :]
        return out[0][jnp.asarray(info_np), :], out[1]

    decode.lane_major = decode_lane_major
    decode.program_steps = len(prog.steps)
    decode.program_branches = len(prog.branches)
    return decode


def _interp_kernel_entry(prog, n, kl, cdtype, want_cw, want_u, count,
                         frozen_col, prog_ref, llr_ref, *refs):
    """Dispatcher shim: lays out refs per mode then runs the
    interpreter. Separated from :func:`_interp_kernel` so the mask
    handling below can evolve without touching the core loop."""
    _interp_core(prog, n, kl, cdtype, want_cw, want_u, count, frozen_col,
                 prog_ref, llr_ref, refs)


def _interp_core(prog, n, kl, cdtype, want_cw, want_u, count, frozen_col,
                 prog_ref, llr_ref, refs):
    refs = list(refs)
    cwt_ref = mask_ref = None
    if count:
        cwt_ref = refs.pop(0)
        mask_ref = refs.pop(0)
        counters_ref = refs.pop(0)
        soft, hard, cw_buf = refs
        u_buf = None
    else:
        outs = refs[:want_u + want_cw]
        soft, hard = refs[want_u + want_cw:]
        u_buf = outs[0] if want_u else None
        cw_buf = outs[-1] if want_cw else None
    env = _Env(soft, hard, cw_buf, u_buf, cdtype, align=min(1 << kl, _CHAIN_CHUNK_ROWS))

    soft[pl.ds(n, n), :] = llr_ref[...].astype(soft.dtype)
    if prog.ones_init or want_u:
        hard[...] = jnp.ones_like(hard)
        if cw_buf is not None:
            cw_buf[...] = jnp.ones_like(cw_buf)
        if u_buf is not None:
            u_buf[...] = jnp.ones_like(u_buf)

    branches = [mk(env) for mk in prog.makes()]

    _run_program(prog_ref, len(prog.steps), branches, kl)

    if count:
        from .step_kernel import _count_and_store

        info = (jnp.float32(1.0)
                - mask_ref[:, :1].astype(jnp.float32))
        _count_and_store(counters_ref, llr_ref[...], cwt_ref[...],
                         cw_buf[...].astype(jnp.float32),
                         cwt_ref[...].astype(jnp.float32), info, wide=True)


def make_interp_decode_count(
    code: PolarCode,
    tree: Node | None = None,
    *,
    subtree_level: int = 10,
    frame_tile: int = 128,
    compute_dtype=jnp.float32,
    storage_dtype=jnp.int8,
    interpret: bool = False,
    vmem_limit_mb: int | None = None,
):
    """``count(llr_t, cw_t) -> counter dict`` — the interpreter twin of
    :func:`.step_kernel.make_pallas_decode_count` (identical counter
    math, ``testbench.cc:185-192``), for the sizes whose unrolled
    decode+count kernels cannot compile (m ≥ 15: receipt
    ``m15-decodecount-t128`` HTTP-413). The frozen mask rides in as an
    int8 input column (constant block index — fetched once), NOT as
    baked broadcast-run constants: at rate 1/2, m ≥ 15 the mask has
    thousands of runs and the constants alone bloated the r3 middle
    kernel's MLIR to 16.4 MB."""
    if tree is None:
        tree = compile_code(code)
    n = code.N
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    kl = min(subtree_level, code.level)
    prog = _build_program(tree, kl, want_cw=True, want_u=False)
    words_np = prog.words(kl)
    mask_np = np.broadcast_to(
        np.asarray(code.frozen, np.int8).reshape(n, 1), (n, 128)).copy()
    kernel = functools.partial(
        _interp_kernel_entry, prog, n, kl, compute_dtype, True, False,
        True, None)

    from .step_kernel import _N_COUNTERS

    def count(llr_t, cw_t):
        if llr_t.shape != cw_t.shape or llr_t.shape[0] != n:
            raise ValueError(f"expected matching (N={n}, B) inputs")
        batch = llr_t.shape[1]
        if batch % frame_tile:
            raise ValueError(f"batch {batch} not a multiple of "
                             f"frame_tile {frame_tile}")
        grid = batch // frame_tile
        blk = lambda ix=lambda i: (0, i): pl.BlockSpec(  # noqa: E731
            (n, frame_tile), ix, memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(), blk(),
                      pl.BlockSpec((n, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, _N_COUNTERS), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2 * n, frame_tile), storage_dtype),
                pltpu.VMEM((n, frame_tile), jnp.int8),
                pltpu.VMEM((n, frame_tile), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=(vmem_limit_mb << 20)
                if vmem_limit_mb else None),
            interpret=interpret,
        )(jnp.asarray(words_np), llr_t, cw_t, jnp.asarray(mask_np))
        t = jnp.sum(out, axis=0)
        return {
            "uncorrected_errors": t[0],
            "frame_errors": t[1],
            "ambiguity_erasures": t[2],
            "awgn_errors": t[3],
            "quantization_erasures": t[4],
        }

    return count


def _info_positions(node: Node, pos: int = 0) -> list:
    """u-domain info-bit positions of a subtree, ascending — the mesg
    emission order (in-order traversal ≡ ascending u position)."""
    s = 1 << node.level
    if node.kind == "rate0":
        return []
    if node.kind == "rate1":
        return list(range(pos, pos + s))
    if node.kind == "rep":
        return [pos + s - 1]
    if node.kind == "spc":
        return list(range(pos + 1, pos + s))
    half = s >> 1
    if node.kind == "rate0_right":
        return _info_positions(node.right, pos + half)
    if node.kind == "rate1_comb":
        return (_info_positions(node.left, pos)
                + list(range(pos + half, pos + s)))
    return (_info_positions(node.left, pos)
            + _info_positions(node.right, pos + half))


def _interp_subtree_kernel(prog, n, kl, cdtype, emit_u, emit_cw,
                           prog_ref, llr_ref, *refs):
    refs = list(refs)
    u_buf = refs.pop(0) if emit_u else None
    hard = refs.pop(0)
    cw_buf = refs.pop(0) if emit_cw else None
    soft = refs.pop(0)
    env = _Env(soft, hard, cw_buf, u_buf, cdtype, align=min(1 << kl, _CHAIN_CHUNK_ROWS))
    soft[pl.ds(n, n), :] = llr_ref[...].astype(soft.dtype)
    if prog.ones_init:
        hard[...] = jnp.ones_like(hard)
        if cw_buf is not None:
            cw_buf[...] = jnp.ones_like(cw_buf)
        if u_buf is not None:
            u_buf[...] = jnp.ones_like(u_buf)
    branches = [mk(env) for mk in prog.makes()]

    _run_program(prog_ref, len(prog.steps), branches, kl)


def make_interp_subtree(
    node: Node,
    *,
    frame_tile: int = 128,
    compute_dtype=jnp.float32,
    storage_dtype=jnp.int8,
    interpret: bool = False,
    emit_cw: bool = False,
    emit_u: bool = True,
    layout: str = "frame",
    subtree_level: int = 10,
    vmem_limit_mb: int | None = None,
):
    """Interpreter twin of :func:`.decoder_kernel.make_subtree_decoder`
    (same output contract: ``(u?, hard, cw?)`` blocks; no boundary
    fusion) for the hybrid decoder's kernel-resident subtrees. The SSA
    subtree kernels above level 15 are compile-bound (kl15 builds ran
    ~15-25 min through the relay); the interpreter form's O(distinct
    bodies) program makes level-16/17 kernel-resident subtrees
    practical — each extra level halves the XLA top's depth and its
    per-level HBM passes. The u output is gathered from the aligned
    u-domain buffer OUTSIDE the kernel (one XLA gather per call site).
    Bit-exact with the SSA subtree kernels (tests)."""
    n = 1 << node.level
    k = node.mesg_bits
    if k < 1:
        raise ValueError("kernelize only nodes that emit message bits")
    if frame_tile % 128:
        raise ValueError("frame_tile must be a multiple of 128")
    kl = min(subtree_level, node.level)
    prog = _build_program(node, kl, want_cw=emit_cw, want_u=emit_u,
                          root_need_hard=True)
    # numpy at build time: this builder runs INSIDE the hybrid's trace,
    # and jnp constants created under one trace leak into later ones
    words_np = prog.words(kl)
    kernel = functools.partial(_interp_subtree_kernel, prog, n, kl,
                               compute_dtype, emit_u, emit_cw)
    out_rows = ((n,) if emit_u else ()) + (n,) + ((n,) if emit_cw else ())
    info_np = np.asarray(_info_positions(node), np.int32)
    assert info_np.shape[0] == k

    def call(llr_t):
        bt = frame_tile
        blk = lambda: pl.BlockSpec((n, bt), lambda i: (0, i),  # noqa: E731
                                   memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(llr_t.shape[1] // bt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk()],
            out_specs=tuple(blk() for _ in out_rows),
            out_shape=tuple(
                jax.ShapeDtypeStruct((r, llr_t.shape[1]), jnp.int8)
                for r in out_rows),
            scratch_shapes=[pltpu.VMEM((2 * n, frame_tile), storage_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
                if interpret else ("parallel",),
                vmem_limit_bytes=(vmem_limit_mb << 20)
                if vmem_limit_mb else None),
            interpret=interpret,
        )(jnp.asarray(words_np), llr_t)
        if emit_u:
            return (out[0][jnp.asarray(info_np), :],) + tuple(out[1:])
        return out

    if layout == "lane":
        def decode_lane(llr_t):
            if llr_t.shape[0] != n or llr_t.shape[1] % frame_tile:
                raise ValueError(
                    f"lane layout expects ({n}, B) input with B a "
                    f"multiple of frame_tile {frame_tile}")
            return call(llr_t)

        return decode_lane
    if layout != "frame":
        raise ValueError(f"unknown layout {layout!r}")

    def decode(llr):
        if llr.shape[0] % frame_tile:
            raise ValueError(
                f"batch {llr.shape[0]} not a multiple of frame_tile "
                f"{frame_tile} (pad the batch once at the top level)")
        return tuple(o.T for o in call(llr.T))

    return decode
