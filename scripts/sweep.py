#!/usr/bin/env python
"""Consolidated TPU measurement / receipts CLI (round 3+).

Supersedes the round-2 one-off session scripts (tpu_session{2,3,4}.py,
sweep_r2.py, sweep_r2c.py — deleted; their receipts live on in
results/throughput_receipts{,_r2}.txt). One process per invocation,
run serially — a single python process holds the TPU grant.

Receipts append to results/throughput_receipts_r5.txt as JSON lines
(rounds 1-4: throughput_receipts{,_r2,_r3,_r4}.txt).

  python scripts/sweep.py --stage frontprofile   # block-front part timings
  python scripts/sweep.py --stage prngrate       # hardware-PRNG draw rate
  python scripts/sweep.py --list                 # all stages
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RECEIPTS = Path(__file__).resolve().parent.parent / "results" / \
    "throughput_receipts_r5.txt"


def log(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(RECEIPTS, "a") as f:
        f.write(line + "\n")


def guard(name, fn):
    """Run one measurement, recording failures as receipts (compile
    wedges / VMEM OOMs are per-config tolerated, the sweep continues)."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — record and continue
        log({"cfg": name, "error": f"{type(e).__name__}: {e}",
             "trace": traceback.format_exc()[-600:], "ts": time.time()})
        return None


def llr_batch(code, batch, seed=42):
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(-128, 128, (batch, code.N)).astype(np.int8))


def measure(name, mk_decoder, llrs, iters=64, **kw):
    """Decode-only frames/s via the hardened chained-slope meter."""
    from polar_tpu.utils.benchmark import measure_decode_fps

    def run():
        t0 = time.perf_counter()
        dec = mk_decoder()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        fps = measure_decode_fps(dec, llrs, iters=iters, **kw)
        log({"cfg": name, "batch": int(llrs.shape[0]),
             "n": int(llrs.shape[1]), "fps": round(fps, 1),
             "build_s": round(time.perf_counter() - t0 + t_build, 1),
             "ts": time.time()})
        return fps

    return guard(name, run)


def measure_keyed(name, fn, batch, iters=32, extra=None, **kw):
    """Rate of an arbitrary keyed device function ``fn(key) -> pytree``:
    iterations chained through the PRNG key split inside one jitted
    fori_loop, all outputs folded into the pulled checksum (nothing
    elidable), hardened slope acceptance. Reports frames/s given the
    per-call ``batch``."""
    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.benchmark import _slope_seconds_per_iter

    def run():
        def runner(k0, it):
            def body(_, carry):
                k, acc = carry
                k, sub = jax.random.split(k)
                out = fn(sub)
                s = sum(jnp.sum(v.astype(jnp.int32)) if v.dtype != jnp.int32
                        else jnp.sum(v) for v in jax.tree.leaves(out))
                return k, acc + s

            _, acc = jax.lax.fori_loop(0, it, body, (k0, jnp.int32(0)))
            return acc

        runner = jax.jit(runner, static_argnums=(1,))
        key = jax.random.PRNGKey(7)

        def timed(it):
            t0 = time.perf_counter()
            int(runner(key, it))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        slope = _slope_seconds_per_iter(timed, iters, **kw)
        rec = {"cfg": name, "batch": batch, "fps": round(batch / slope, 1),
               "ms_per_call": round(slope * 1e3, 4),
               "measure_s": round(time.perf_counter() - t0, 1),
               "ts": time.time()}
        if extra:
            rec.update(extra)
        log(rec)
        return batch / slope

    return guard(name, run)


def measure_chain(name, fn, x0, iters=32, extra=None, **kw):
    """Rate of an array-to-array device function ``fn(x) -> x'`` (same
    shape/dtype): iterations feed each output to the next input — a true
    data dependency, so nothing is hoisted or elided."""
    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.benchmark import _slope_seconds_per_iter

    def run():
        def runner(x, it):
            y = jax.lax.fori_loop(0, it, lambda _, v: fn(v), x)
            return jnp.sum(y.astype(jnp.int32))

        runner = jax.jit(runner, static_argnums=(1,))

        def timed(it):
            t0 = time.perf_counter()
            int(runner(x0, it))
            return time.perf_counter() - t0

        batch = int(x0.shape[-1])
        t0 = time.perf_counter()
        slope = _slope_seconds_per_iter(timed, iters, **kw)
        rec = {"cfg": name, "batch": batch, "fps": round(batch / slope, 1),
               "ms_per_call": round(slope * 1e3, 4),
               "measure_s": round(time.perf_counter() - t0, 1),
               "ts": time.time()}
        if extra:
            rec.update(extra)
        log(rec)
        return batch / slope

    return guard(name, run)


def measure_step(name, code, batch, iters=32, snr_db=0.5, **mk_kw):
    """End-to-end Monte-Carlo step rate through make_step_body."""
    import jax

    from polar_tpu.ber import make_step_body

    def run():
        body = make_step_body(code, **mk_kw)
        step = jax.jit(lambda k, s: body(k, s, batch))
        return measure_keyed(name, lambda k: step(k, snr_db), batch,
                             iters=iters)

    return guard(name, run)


# ---------------------------------------------------------------------
# Probe kernels: isolate the hardware-PRNG draw rate and the per-stage
# cost of the front's in-kernel math (measurement-only code).
# ---------------------------------------------------------------------

def _mk_probe(rows, frame_tile, body_fn, n_draws):
    """A kernel that draws ``n_draws`` (rows, frame_tile) u32 blocks,
    maps them through ``body_fn`` and folds to one scalar per grid step
    (the fold costs ~1 add/element — identical across probes, so probe
    DIFFERENCES isolate the draw/math cost)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polar_tpu.ops.pallas.step_kernel import (_GOLDEN, _key_seeds,
                                                  _random_u32)

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (pl.program_id(0) * jnp.int32(_GOLDEN)))
        acc = jnp.float32(0.0)
        for _ in range(n_draws):
            bits = _random_u32((rows, frame_tile))
            acc = acc + jnp.sum(body_fn(bits))
        out_ref[pl.program_id(0), 0] = acc.astype(jnp.int32)

    def probe(key, batch):
        grid = batch // frame_tile
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(_key_seeds(key))
        return jnp.sum(out)

    return probe


def stage_prngrate(m=14, batch=2048, tile=128):
    """How fast does pltpu.prng_random_bits actually draw? Probes at the
    m14 front shape (16384 rows x 128 lanes x 16 grid steps): 1 vs 2
    draws isolates the marginal draw cost; sym/normals add the front's
    per-draw math on top."""
    import jax
    import jax.numpy as jnp

    from polar_tpu.ops.pallas.step_kernel import (_bits_to_normals,
                                                  _bits_to_sym)

    rows = 1 << m
    el = rows * batch

    def bitsum(b):
        return jax.lax.bitcast_convert_type(b, jnp.int32).astype(jnp.float32)

    probes = [
        ("draw1", rows, 1, bitsum),
        ("draw2", rows, 2, bitsum),
        ("draw4", rows, 4, bitsum),
        ("sym1", rows, 1, _bits_to_sym),
        # Box-Muller holds several f32 temporaries per block — probe at
        # kernel B's actual row-block height (4096), padding the grid so
        # the element count stays comparable
        ("normals1-r4096", 4096, 1, _bits_to_normals),
        ("sym1-r4096", 4096, 1, _bits_to_sym),
    ]
    for name, r, nd, body in probes:
        fn = _mk_probe(r, tile, body, nd)
        b = batch * (rows // r)
        measure_keyed(f"m{m}-probe-{name}", lambda k, f=fn, bb=b: f(k, bb),
                      b, iters=32, extra={"rows": r, "draws": nd,
                                          "elements": r * b})


def stage_mathprobe(rows=4096, tile=128, batch=8192):
    """Per-op cost of the channel kernel's math building blocks, each on
    top of the draw1 baseline (probe differences isolate the op): the
    Box-Muller candidates for replacement (log, sqrt, cos, sin) and the
    glue (unit-convert, rint/clip)."""
    import jax
    import jax.numpy as jnp

    from polar_tpu.ops.pallas.step_kernel import _bits_to_unit

    def as_f32(b):
        return jax.lax.bitcast_convert_type(b, jnp.int32).astype(jnp.float32)

    probes = [
        ("base", lambda b: as_f32(b)),
        ("unit", lambda b: _bits_to_unit(b)),
        ("log", lambda b: jnp.log(_bits_to_unit(b))),
        ("sqrt", lambda b: jnp.sqrt(_bits_to_unit(b))),
        ("cos", lambda b: jnp.cos(_bits_to_unit(b) * jnp.float32(6.283))),
        ("sin", lambda b: jnp.sin(_bits_to_unit(b) * jnp.float32(6.283))),
        ("rintclip", lambda b: jnp.clip(jnp.rint(_bits_to_unit(b) *
                                                 jnp.float32(77.3)),
                                        jnp.float32(-128), jnp.float32(127))),
        ("exp2", lambda b: jnp.exp2(_bits_to_unit(b))),
        ("rlog", lambda b: jnp.sqrt(jnp.float32(-2.0) *
                                    jnp.log(_bits_to_unit(b)))),
    ]
    for name, body in probes:
        fn = _mk_probe(rows, tile, body, 1)
        measure_keyed(f"mathprobe-{name}", lambda k, f=fn: f(k, batch),
                      batch, iters=64, extra={"rows": rows,
                                              "elements": rows * batch})


def stage_frontprofile(ms=(13, 14), systematic=True):
    """Split the block front's cost into its three parts (kernel A /
    XLA middle / kernel B) at the campaign batch sizes — the m14 front
    is 1.81 ms vs 1.15 ms decode (receipts m14-blockfront-*), and this
    locates the milliseconds before any optimization."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        front = make_pallas_front_blocks(code, frame_tile=128,
                                         block_level=min(13, m - 1),
                                         systematic=systematic)
        tag = "sys" if systematic else "nonsys"
        measure_keyed(f"m{m}-front-{tag}-total",
                      lambda k, f=front, b=batch: f(k, 0.5, b), batch)
        measure_keyed(f"m{m}-front-{tag}-kernelA",
                      lambda k, f=front, b=batch: f.draw_u0(k, b), batch)
        # middle: array-chained (output feeds the next input — the
        # values stay in ±1 so the chain is self-sustaining); kernel B:
        # keyed on a fixed middle output (the PRNG key changes per
        # iteration, so the call can't be hoisted)
        u0 = jax.jit(front.draw_u0, static_argnums=(1,))(
            jax.random.PRNGKey(3), batch)
        measure_chain(f"m{m}-front-{tag}-middle", front.middle, u0)
        x = jax.device_put(jax.jit(front.middle)(u0))
        del u0
        measure_keyed(f"m{m}-front-{tag}-kernelB",
                      lambda k, xx=x, f=front: f.channel(k, xx, 0.5), batch)


def stage_frontmid(ms=(15, 16), systematic=True):
    """A/B the block front's middle: per-stage XLA passes ("xla") vs
    ONE Pallas VMEM pass over the full (N, tile) ±1 column
    (middle_mode="kernel" — since r4 the mask-free split form: two
    stage-pass kernels around one XLA refreeze). m16 systematic pays 8
    XLA stage passes (~0.1 ms of HBM each at batch 512) — the dominant
    front cost at m >= 15 after the poly-sincos kernel B. Winners per
    level are adopted in step_kernel._MIDDLE_KERNEL_LEVELS."""
    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks

    tag = "sys" if systematic else "nonsys"
    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        for mode in ("xla", "kernel"):
            front = make_pallas_front_blocks(
                code, frame_tile=128, block_level=min(13, m - 1),
                systematic=systematic, middle_mode=mode)
            measure_keyed(f"m{m}-frontmid-{tag}-{mode}",
                          lambda k, f=front, b=batch: f(k, 0.5, b), batch)


def stage_steprate(ms=(13, 14, 15, 16), systematic=True):
    """End-to-end Monte-Carlo step rate at the large-N frontier — the
    VERDICT r2 'chain at decode speed' gap (targets >= 60% of
    decode-only)."""
    import polar_tpu as pt

    tag = "sys" if systematic else "nonsys"
    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        measure_step(f"m{m}-steprate-{tag}", code, batch,
                     systematic=systematic, rng="pallas")


def stage_countk(ms=(15, 16)):
    """Counter-epilogue A/B at the levels above the decode_count
    fusion ceiling: the default XLA reduction passes vs the single-pass
    Pallas counter kernel (make_pallas_count), measured through the
    FULL campaign step (the adoption decision). Winner populates
    ber._COUNT_KERNEL_LEVELS."""
    import polar_tpu as pt
    import polar_tpu.ber as ber

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        orig = ber._COUNT_KERNEL_LEVELS
        try:
            ber._COUNT_KERNEL_LEVELS = frozenset()
            measure_step(f"m{m}-countk-xla", code, batch,
                         systematic=True, rng="pallas")
            ber._COUNT_KERNEL_LEVELS = frozenset({m})
            measure_step(f"m{m}-countk-kernel", code, batch,
                         systematic=True, rng="pallas")
        finally:
            ber._COUNT_KERNEL_LEVELS = orig


def stage_stepkl15(ms=(16, 17)):
    """ADVICE r3: kl15 subtree kernels win decode-only A/Bs at m>=16
    (klladder/klcw receipts) but have NO receipt inside the actual
    campaign step loop, where scoped VMEM is tighter (r3's one combined
    attempt OOM'd). A/B the in-loop hybrid config via the
    front_decode_cfg override: default kl13-t128 vs kl15-t128-v110.
    Promote in ber._front_decode_cfg only if kl15 wins here."""
    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        measure_step(f"m{m}-steprate-sys-kl13", code, batch,
                     systematic=True, rng="pallas")
        measure_step(f"m{m}-steprate-sys-kl15v110", code, batch,
                     systematic=True, rng="pallas",
                     front_decode_cfg=(15, 128, 110))


def stage_frontcfg(m=13, batch=4096):
    """Block-front geometry A/B at m13: frame tile 256 (fewer, wider
    grid steps), taller channel blocks (the leaner poly-sincos channel
    math may fit blk 8192 where the builtin-trig form OOM'd at 17.9M),
    and their combinations."""
    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks

    code = pt.make_code(m, rate=0.5)
    for bl, cbl, tile in ((13, 12, 128), (13, 13, 128), (13, 11, 256),
                          (13, 12, 256), (12, 11, 256)):
        front = make_pallas_front_blocks(
            code, frame_tile=tile, block_level=min(bl, m - 1),
            chan_block_level=min(cbl, m), systematic=True)
        measure_keyed(f"m{m}-frontcfg-bl{bl}-cbl{cbl}-t{tile}",
                      lambda k, f=front, b=batch: f(k, 0.5, b), batch)


def stage_decodecount(m=13, batch=4096):
    """Fused decode+count at m13 (the front path still runs separate
    decode + XLA counters there): does the whole-code decode_count
    kernel fit VMEM at m13-t128, and what's the step-shaped rate
    (decode+count on fixed front outputs) vs the split path?"""
    import jax

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import (make_pallas_decode_count,
                                                  make_pallas_front_blocks)

    import jax.numpy as jnp

    code = pt.make_code(m, rate=0.5)
    front = make_pallas_front_blocks(code, frame_tile=128,
                                     block_level=m - 1, systematic=True)
    llr_t, cw_t = jax.jit(lambda k: front(k, 0.5, batch))(
        jax.random.PRNGKey(5))

    def perturbed(k, a):
        # key-derived int8 scalar added to the LLRs: a true per-iteration
        # data dependency (decode cost is data-independent), nothing
        # hoistable out of the timing loop
        d = jax.random.key_data(k).reshape(-1)[0].astype(jnp.int8)
        return a + d

    vmem = {13: 32, 14: 64, 15: 110}.get(m)
    for tile in (128, 256):
        dc = make_pallas_decode_count(code, frame_tile=tile,
                                      vmem_limit_mb=vmem)
        measure_keyed(f"m{m}-decodecount-t{tile}",
                      lambda k, f=dc, a=llr_t, b=cw_t: f(perturbed(k, a), b),
                      batch)


def stage_fusef(ms=(14, 15, 16)):
    """Boundary-fusion A/B: hybrid kl13-t128 with and without
    kernel_fuse (the boundary f/g/comb absorbed into the kernels),
    output=u frame-major (the THROUGHPUT-table config). The fused
    kernels need ~18M scoped VMEM (the doubled input block), so the
    fused variant raises the Mosaic budget past the default 16M."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        for fuse, vmem in ((False, None), (True, 32), (True, 64)):
            measure(f"m{m}-hybrid-fusef{int(fuse)}-v{vmem or 16}",
                    lambda f=fuse, v=vmem, c=code: pt.make_fastssc_decoder(
                        c, output_dtype=jnp.int8, kernel_level=13,
                        kernel_frame_tile=128, kernel_fuse=f,
                        kernel_vmem_limit_mb=v),
                    llrs, iters=16)


def stage_vmem2():
    """Exploit the raised VMEM budget (vmemprobe receipts: 32-96M
    budgets accepted, a 22.9M m14 whole-code kernel runs at 1.82M fps >
    the hybrid's 1.81M):

    * m15 whole-code (live ~45.7M) at v64/v96/v110 — the definitive
      physical-VMEM probe;
    * m16 whole-code (~91M) at v110 — expected to find the ceiling;
    * m14 whole-code fused-cw + decode_count at v64 — the front path's
      decode at m14;
    * the fused STEP kernel at m13 (needed ~20.1M, r2 OOM receipt) and
      m14 — the whole Monte-Carlo chain in one kernel at large N.
    """
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import (make_pallas_decode_count,
                                                  make_pallas_front_blocks,
                                                  make_pallas_step)

    code15 = pt.make_code(15, rate=0.5)
    llrs15 = llr_batch(code15, 1024)
    for v in (64, 96, 110):
        if measure(f"m15-wholecode-ssa-t128-v{v}",
                   lambda vv=v, c=code15: pt.make_pallas_decoder(
                       c, frame_tile=128, compute_dtype=jnp.float32,
                       style="ssa", vmem_limit_mb=vv),
                   llrs15, iters=16):
            break
    code16 = pt.make_code(16, rate=0.5)
    measure("m16-wholecode-ssa-t128-v110",
            lambda: pt.make_pallas_decoder(
                code16, frame_tile=128, compute_dtype=jnp.float32,
                style="ssa", vmem_limit_mb=110),
            llr_batch(code16, 512), iters=16)

    code14 = pt.make_code(14, rate=0.5)
    measure("m14-wholecode-cw-t128-v64",
            lambda: pt.make_pallas_decoder(
                code14, frame_tile=128, compute_dtype=jnp.float32,
                style="ssa", output="codeword", vmem_limit_mb=64),
            llr_batch(code14, 2048), iters=16)

    # decode_count at m14 on real front outputs
    front = make_pallas_front_blocks(code14, frame_tile=128,
                                     block_level=13, systematic=True)
    llr_t, cw_t = jax.jit(lambda k: front(k, 0.5, 2048))(
        jax.random.PRNGKey(5))

    def perturbed(k, a):
        d = jax.random.key_data(k).reshape(-1)[0].astype(jnp.int8)
        return a + d

    dc = make_pallas_decode_count(code14, frame_tile=128, vmem_limit_mb=64)
    measure_keyed("m14-decodecount-t128-v64",
                  lambda k, f=dc, a=llr_t, b=cw_t: f(perturbed(k, a), b),
                  2048)

    # the fused whole-chain step kernel above its old N=4096 ceiling
    for m, batch, v in ((13, 4096, 48), (14, 2048, 96)):
        code = pt.make_code(m, rate=0.5)

        def run(mm=m, bb=batch, vv=v, cc=code):
            step = make_pallas_step(cc, frame_tile=128, vmem_limit_mb=vv)
            sj = jax.jit(lambda k: step(k, 0.5, bb))
            return measure_keyed(f"m{mm}-stepkernel-t128-v{vv}",
                                 lambda k: sj(k), bb)

        guard(f"m{m}-stepkernel-t128-v{v}", run)


def stage_vmem3():
    """Round-3 follow-ups: the sys front's decode candidates at m15
    (whole-code CW kernel at v110 — the decode_count twin hit the
    relay's HTTP 413 program-size limit; the plain cw kernel serializes
    smaller), and the NONSYS fused step kernels at m13/m14 (the sys
    variants receipted 1.634M/824.2K; nonsys was faster at every
    smaller N)."""
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step

    code15 = pt.make_code(15, rate=0.5)
    measure("m15-wholecode-cw-t128-v110",
            lambda: pt.make_pallas_decoder(
                code15, frame_tile=128, compute_dtype=jnp.float32,
                style="ssa", output="codeword", vmem_limit_mb=110),
            llr_batch(code15, 1024), iters=16)

    for m, batch, v in ((13, 4096, 48), (14, 2048, 96)):
        code = pt.make_code(m, rate=0.5)

        def run(mm=m, bb=batch, vv=v, cc=code):
            step = make_pallas_step(cc, frame_tile=128, vmem_limit_mb=vv,
                                    systematic=False)
            sj = jax.jit(lambda k: step(k, 0.5, bb))
            return measure_keyed(f"m{mm}-stepkernel-nonsys-t128-v{vv}",
                                 lambda k: sj(k), bb)

        guard(f"m{m}-stepkernel-nonsys-t128-v{v}", run)


def stage_parity(ms=(14, 15, 16)):
    """TPU bit-exactness spot-check of the NEW whole-code champions
    (v32/v64/v110 budgets): random full-range int8 LLR batch decoded on
    the chip vs the XLA path on CPU, plus a noiseless round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import polar_tpu as pt

    for m in ms:
        def run(mm=m):
            code = pt.make_code(mm, rate=0.5)
            rng = np.random.default_rng(mm)
            llr = jnp.asarray(
                rng.integers(-128, 128, (256, code.N)).astype(np.int8))
            dec, desc = pt.make_auto_decoder(code, output="u",
                                             backend="tpu")
            got = np.asarray(jax.jit(dec)(llr))
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                ref = np.asarray(jax.jit(pt.make_fastssc_decoder(
                    code, output_dtype=jnp.int8))(jax.device_put(llr, cpu)))
            msg = (1 - 2 * rng.integers(0, 2, (128, code.K))).astype(np.int8)
            cw = pt.encode(code, jnp.asarray(msg))
            rt = np.asarray(jax.jit(dec)(
                (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)))
            log({"cfg": f"m{mm}-parity-wholecode", "decoder": desc,
                 "tpu_vs_cpu_bitexact": bool(np.array_equal(got, ref)),
                 "noiseless_roundtrip": bool(np.array_equal(rt, msg)),
                 "ts": time.time()})

        guard(f"m{m}-parity-wholecode", run)


def stage_stepkernel(ms=(13, 14)):
    """The whole-chain fused step kernel above its old N=4096 ceiling:
    retry after the wide-compare fix (the first attempt tripped
    Mosaic's int8-compare rejection, receipts m13/m14-stepkernel-*)."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        v = {13: 48, 14: 96}[m]
        code = pt.make_code(m, rate=0.5)

        def run(mm=m, bb=batch, vv=v, cc=code):
            step = make_pallas_step(cc, frame_tile=128, vmem_limit_mb=vv)
            sj = jax.jit(lambda k: step(k, 0.5, bb))
            return measure_keyed(f"m{mm}-stepkernel-t128-v{vv}",
                                 lambda k: sj(k), bb)

        guard(f"m{m}-stepkernel-t128-v{v}", run)


def stage_klladder(ms=(15, 16, 17, 18)):
    """Hybrid kernel-level ladder UNDER A RAISED VMEM BUDGET: the r2
    ladder stopped at kl13 because kl14's body exceeded the 16M default
    — a false wall (vmemprobe). kl14-t128 needs ~23M, kl15-t128 ~46M;
    each extra level halves the XLA top's depth."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        cfgs = [(14, 32), (14, 48)]
        if m >= 16:
            cfgs.append((15, 64))
        for kl, v in cfgs:
            measure(f"m{m}-hybrid-kl{kl}-t128-v{v}",
                    lambda k=kl, vv=v, c=code: pt.make_fastssc_decoder(
                        c, output_dtype=jnp.int8, kernel_level=k,
                        kernel_frame_tile=128, kernel_vmem_limit_mb=vv),
                    llrs, iters=16)


def stage_klcw(ms=(16, 17)):
    """cw-track kl15 hybrids (BACKLOG: unreceipted — u receipts only).
    The u-track kl15 subtree kernels won m17 +24% / m18 +13% over kl13;
    if the cw variants (hard+cw outputs, ``emit_u=False``) fit the
    raised budgets, systematic/codeword decodes and the m16+ sys step
    gain the same way. kl13-cw runs first as the same-process baseline
    (its kernels are already in the compile cache)."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        for kl, v in ((13, None), (15, 110)):
            measure(f"m{m}-hybridcw-kl{kl}-t128" + (f"-v{v}" if v else ""),
                    lambda k=kl, vv=v, c=code: pt.make_fastssc_decoder(
                        c, output="codeword", output_dtype=jnp.int8,
                        kernel_level=k, kernel_frame_tile=128,
                        kernel_vmem_limit_mb=vv),
                    llrs, iters=16)


def stage_klcwfuse(ms=(16, 17), vmem=None):
    """Fused-kl15 A/B (VERDICT r3 next-4): boundary f/g/comb fusion is
    receipted only for kl13 (m17-u +4.2%); kl15 hybrids shipped
    unfused on extrapolation. Measures fused vs unfused kl15 on the
    cw track (the systematic/codeword decoder everyone calls,
    ``/root/reference/polar_decoder.hh:131``) and the u track."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        tracks = (("codeword", 110), ("u", 64)) if vmem is None \
            else (("codeword", vmem), ("u", vmem))
        for out, v in tracks:
            for fuse in (False, True):
                measure(
                    f"m{m}-hybrid{'cw' if out != 'u' else 'u'}-kl15-"
                    f"fuse{int(fuse)}-v{v}",
                    lambda f=fuse, vv=v, o=out, c=code:
                        pt.make_fastssc_decoder(
                            c, output=o, output_dtype=jnp.int8,
                            kernel_level=15, kernel_frame_tile=128,
                            kernel_fuse=f, kernel_vmem_limit_mb=vv),
                    llrs, iters=16)


def stage_interp(ms=(13, 15, 16), kls=(8, 10)):
    """The interpreter-style kernel (program-size diet) on chip:
    decode+count at the sizes whose unrolled twins can't compile
    (m15/m16, receipt m15-decodecount-t128 HTTP-413), plus m13 as the
    known-baseline sanity point (unrolled decode_count = 3.56M).
    Records build (trace+compile) time — the diet's second claim."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import polar_tpu as pt
    from polar_tpu.ops.pallas.interp_kernel import make_interp_decode_count
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        front = make_pallas_front_blocks(code, frame_tile=128,
                                         block_level=min(13, m - 1),
                                         systematic=True)
        llr_t, cw_t = jax.jit(lambda k, f=front, b=batch: f(k, 0.5, b))(
            jax.random.PRNGKey(5))

        def perturbed(k, a):
            d = jax.random.key_data(k).reshape(-1)[0].astype(jnp.int8)
            return a + d

        for kl in kls:
            name = f"m{m}-interp-decodecount-kl{kl}"

            # measured scoped need: 17.02M at m13, 68.02M at m15 (OOM
            # receipts at 16M/64M) — ~17M x N/8192: the int8 planes are
            # only ~7M x N/8192, the rest is the top chain ops' f32
            # temporaries. At m16 the f32 form would need ~136M > the
            # chip; bf16 compute (bit-exact — r2 receipt) halves the
            # temps, so m16 runs bf16.
            vmem = {13: 32, 14: 48, 15: 96, 16: 110}.get(m, 110)
            cdt = jnp.bfloat16 if m >= 16 else jnp.float32

            def run(kl=kl, name=name, vmem=vmem, cdt=cdt):
                t0 = time.perf_counter()
                dc = make_interp_decode_count(code, subtree_level=kl,
                                              frame_tile=128,
                                              compute_dtype=cdt,
                                              vmem_limit_mb=vmem)
                cnt = dc(llr_t, cw_t)   # first call: trace+compile
                first = int(cnt["uncorrected_errors"])
                build_s = time.perf_counter() - t0
                measure_keyed(name,
                              lambda k, f=dc, a=llr_t, b=cw_t:
                                  f(perturbed(k, a), b),
                              batch, extra={"build_s": round(build_s, 1),
                                            "errs": first})

            guard(name, run)


def stage_interp17(kls=(10, 12), vmem=110):
    """Whole-code m17 via the interpreter kernel: the unrolled SSA
    m17 would need ~183M VMEM (> chip); the interpreter's int8 pyramid
    fits (~100M for u output). Beats VERDICT r3 next-5's two-kernel
    split idea if it lands. Baseline to beat: hybrid kl15 v64 147.6K
    (u), extrapolated kl15-cw (cw)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ops.pallas.interp_kernel import make_interp_decoder

    m, batch = 17, 256
    code = pt.make_code(m, rate=0.5)
    llrs = llr_batch(code, batch)
    for out, v in (("u", vmem), ("codeword", vmem)):
        for kl in kls:
            # bf16 compute: the m17 int8 planes alone are ~80M; f32
            # chain temps would blow past physical VMEM (the f32
            # decode_count form already needed 68M at m15)
            measure(f"m{m}-interp-{'u' if out == 'u' else 'cw'}-kl{kl}-v{v}",
                    lambda k=kl, vv=v, o=out, c=code: make_interp_decoder(
                        c, subtree_level=k, frame_tile=128, output=o,
                        compute_dtype=jnp.bfloat16,
                        vmem_limit_mb=vv),
                    llrs, iters=8)


def stage_biginterp(ms=(18,), kls=(16, 17)):
    """Deep-frontier hybrids with interpreter subtree kernels: each
    kernel level above 15 halves the XLA top's depth and its per-level
    HBM passes, and the interp bodies compile in minutes where SSA
    kl15 took ~15-25 (receipts klladder r3). Baselines: m18-u kl15-v64
    61.2K fps; m17-u kl15-v64 147.6K."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(128, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        for kl in kls:
            v = 110 if kl >= 17 else 64
            measure(f"m{m}-hybrid-interpkl{kl}-t128-v{v}",
                    lambda k=kl, vv=v, c=code: pt.make_fastssc_decoder(
                        c, output_dtype=jnp.int8, kernel_level=k,
                        kernel_style="interp", kernel_frame_tile=128,
                        kernel_vmem_limit_mb=vv),
                    llrs, iters=8)


def stage_bigm_interp(m=23, batch=8, kl=17):
    """Frontier rung via the interpreter hybrid (VERDICT r3 next-6):
    noiseless round-trip at m=23 (N=8,388,608) with interp subtree
    kernels at level 17 — the unrolled-kernel ladder's compile time
    doubled per level (m22: 4134 s first call through kl13)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    def run():
        code = pt.make_code(m, rate=0.5)
        rng = np.random.default_rng(7)
        msg = (1 - 2 * rng.integers(0, 2, (batch, code.K))).astype(np.int8)
        cw = pt.encode(code, jnp.asarray(msg))
        llr = (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)
        del cw
        dec = jax.jit(pt.make_fastssc_decoder(
            code, output_dtype=jnp.int8, kernel_level=kl,
            kernel_style="interp", kernel_frame_tile=128,
            kernel_vmem_limit_mb=110))
        t0 = time.perf_counter()
        out = np.asarray(dec(llr))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = np.asarray(dec(llr))
        t_second = time.perf_counter() - t0
        log({"cfg": f"m{m}-probe-interpkl{kl}", "noiseless_roundtrip":
             bool(np.array_equal(out, msg) and np.array_equal(out2, msg)),
             "first_call_s": round(t_first, 1),
             "steady_call_s": round(t_second, 2),
             "frames": batch, "ts": time.time()})

    guard(f"m{m}-probe-interpkl{kl}", run)


def stage_m17split(m=17, vmem=110):
    """Whole-code m17 via the two-kernel split (VERDICT r3 next-5 /
    r4 next-3): hybrid with kernel_level=16 — the XLA top keeps ONLY
    the root f/g/combine, so the decode is two level-16 kernel calls
    with one HBM hop between them (the unrolled whole-code m17 kernel
    would need ~183M VMEM > the chip). bf16 compute halves the value
    chain's VMEM vs f32 (exact for integers <= 256 — the r2 receipt);
    the f32 twin is attempted for the A/B and its OOM recorded if it
    doesn't fit. Parity is asserted on-chip against the receipted kl15
    champion before timing. Baselines to beat: m17-u kl15-v64 147.6K,
    m17-cw kl15-v110 123.1K fps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import polar_tpu as pt
    from polar_tpu.utils.benchmark import measure_decode_fps

    code = pt.make_code(m, rate=0.5)
    batch = max(128, (1 << 25) // (1 << m))
    llrs = llr_batch(code, batch)
    champs = {}

    def champion(out):
        if out not in champs:
            v = 64 if out == "u" else 110
            champs[out] = jax.jit(pt.make_fastssc_decoder(
                code, output=out, output_dtype=jnp.int8, kernel_level=15,
                kernel_frame_tile=128, kernel_vmem_limit_mb=v))
        return champs[out]

    # bf16 only: the u-bf16 kernel already measures 115.98M scoped
    # (OOM receipt at the 110M cap); the f32 chain is ~2x the bf16
    # temporaries => ~230M >> the chip's 128M physical — no point
    # burning an hour of compile to document that OOM.
    for out, cdt, tag in (("u", jnp.bfloat16, "bf16"),
                          ("codeword", jnp.bfloat16, "bf16")):
        name = f"m{m}-split-{'u' if out == 'u' else 'cw'}-kl16-{tag}-v{vmem}"

        def run(out=out, cdt=cdt, name=name):
            t0 = time.perf_counter()
            dec = jax.jit(pt.make_fastssc_decoder(
                code, output=out, output_dtype=jnp.int8, kernel_level=16,
                kernel_frame_tile=128, kernel_compute_dtype=cdt,
                kernel_vmem_limit_mb=vmem))
            got = np.asarray(dec(llrs))
            build_s = time.perf_counter() - t0
            ref = np.asarray(champion(out)(llrs))
            parity = bool(np.array_equal(got, ref))
            fps = measure_decode_fps(dec, llrs, iters=8)
            log({"cfg": name, "batch": batch, "n": code.N,
                 "fps": round(fps, 1), "build_s": round(build_s, 1),
                 "parity_vs_kl15": parity, "ts": time.time()})

        guard(name, run)


def stage_wrapprofile(m=14, batch=2048):
    """VERDICT r4 next-4: isolate the m14 'dispatch-wrapper penalty'
    (824.2K direct kernel vs 724.2K `m14-steprate-sys`). The two
    receipts measure DIFFERENT programs — ``make_step_body`` never
    builds the whole-chain kernel (only ``make_step``'s auto dispatch
    does); this stage measures every distinct m14 step path at HEAD on
    one batch so the table can name its champion correctly:

      wrap-kernel-direct   make_pallas_step called straight (the r3
                           ``m14-stepkernel-t128-v96`` config)
      wrap-kernel-jit      the same kernel behind one extra jax.jit
                           (make_step's nesting, no dispatch closure)
      wrap-makestep-auto   make_step(code) — the SHIPPED campaign path
                           (r3 ``m14-makestep-auto``: 671.7K)
      wrap-stepbody-front  make_step_body rng='pallas' — the block
                           front+decode_count path that the steprate
                           stage actually measures (724.2K)
    """
    import jax

    import polar_tpu as pt
    from polar_tpu.ber import make_step, make_step_body
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step

    code = pt.make_code(m, rate=0.5)
    snr = 0.5
    for sys_, tag in ((True, "sys"), (False, "nonsys")):
        def run(sys_=sys_, tag=tag):
            kern = make_pallas_step(code, frame_tile=128, prng="native",
                                    systematic=sys_, vmem_limit_mb=96)
            measure_keyed(f"m{m}-wrap-{tag}-kernel-direct",
                          lambda k: kern(k, snr, batch), batch)
            jkern = jax.jit(lambda k, s: kern(k, s, batch))
            measure_keyed(f"m{m}-wrap-{tag}-kernel-jit",
                          lambda k: jkern(k, snr), batch)
            step = make_step(code, systematic=sys_)
            measure_keyed(f"m{m}-wrap-{tag}-makestep-auto",
                          lambda k: step(k, snr, batch), batch)
            body = make_step_body(code, systematic=sys_, rng="pallas")
            jbody = jax.jit(lambda k, s: body(k, s, batch))
            measure_keyed(f"m{m}-wrap-{tag}-stepbody-front",
                          lambda k: jbody(k, snr), batch)

        guard(f"m{m}-wrap-{tag}", run)


def stage_frontcfg2(ms=(15, 16)):
    """VERDICT r4 next-5: kernel B's channel-block cap (4096 rows) was
    measured under the DEFAULT 16M scoped budget (17.9M OOM at 8192
    rows) BEFORE r3 discovered the budget, not the hardware, was the
    wall. The front is the structural cap on every step row, so taller
    channel blocks at raised budgets — fewer kernel-B grid passes and
    fewer XLA middle stages — attack the only term the cap arithmetic
    says matters. Front-only A/B at m15/m16: default (cbl12, 16M
    budget) vs cbl13/14/15 at budgets sized to the measured
    ~17.9M-per-2^13 growth."""
    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        for cbl, vmem in ((12, None), (13, 48), (14, 80), (15, 110)):
            if cbl > m:
                continue
            name = f"m{m}-front2-cbl{cbl}-v{vmem or 16}"

            def run(cbl=cbl, vmem=vmem, name=name, code=code, batch=batch,
                    m=m):
                front = make_pallas_front_blocks(
                    code, frame_tile=128, block_level=min(13, m - 1),
                    chan_block_level=cbl, systematic=True,
                    vmem_limit_mb=vmem)
                measure_keyed(name,
                              lambda k, f=front, b=batch: f(k, 0.5, b),
                              batch)

            guard(name, run)


def stage_frontcfg2step(ms=(15, 16), cbl=13, vmem=48):
    """Step-level adoption A/B for the frontcfg2 winner: the default
    channel-block config vs ``(cbl, vmem)`` through the FULL campaign
    step — the adoption decision for ``ber._FRONT_CHAN_CFG``."""
    import polar_tpu as pt
    import polar_tpu.ber as ber

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        orig = ber._FRONT_CHAN_CFG
        try:
            ber._FRONT_CHAN_CFG = {}
            measure_step(f"m{m}-front2step-default", code, batch,
                         systematic=True, rng="pallas")
            ber._FRONT_CHAN_CFG = {m: (cbl, vmem)}
            measure_step(f"m{m}-front2step-cbl{cbl}-v{vmem}", code, batch,
                         systematic=True, rng="pallas")
        finally:
            ber._FRONT_CHAN_CFG = orig


def stage_packprobe(rows=1024, tile=256, chain=64):
    # rows=2048 OOM'd: XLA stages the full (rows, 8*tile) output on the
    # VMEM stack around the custom call (receipt packprobe-native-f,
    # 18M > the 16M scoped limit); 1024 rows fits with margin and the
    # probe compares per-element rates at equal element counts anyway.
    """Lane-packing probe (VERDICT r3 next-7, the 'only remaining 2x
    lever'): can two int8 frames per 32-bit VPU lane beat the native
    one-value-per-lane kernel? int16 lanes crash Mosaic and bf16 packs
    nothing (r2 receipts), so the remaining route is SWAR — two 16-bit
    fields per uint32 with mask arithmetic.

    The probe measures the CHEAPEST compare-class SWAR op (unsigned
    per-field min, ~9 VPU ops for 2 fields: borrow-mask form
    d=(A|0x80008000)-(B&0x7FFF7FFF)) against the native f-op chain
    (sign-free min-sum, ~5 ops for 1 value) on equal element counts.
    min/sign/clip dominate the decode kernel, so if SWAR-min's
    per-element rate loses to native-f, packing is conclusively dead —
    the decision VERDICT asks to receipt either way."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def native_kernel(x_ref, y_ref, o_ref):
        # chained native f ops: sign-free min-sum on f32 (the real
        # kernel's dominant op mix: 2 abs + min + mul + clip-sign + mul)
        x, y = x_ref[...], y_ref[...]
        one = jnp.float32(1.0)
        for _ in range(chain):
            fabs = jnp.minimum(jnp.abs(x), jnp.abs(y))
            y = jnp.clip(x * y, -one, one) * fabs
            x = x + one
        o_ref[...] = y

    def swar_kernel(x_ref, y_ref, o_ref):
        # chained SWAR per-field unsigned mins (two uint16 magnitude
        # fields per uint32 lane) — the cheapest compare-class SWAR op;
        # a full SWAR f would add sign handling on top.
        H = jnp.uint32(0x80008000)
        L = jnp.uint32(0x7FFF7FFF)
        ONE2 = jnp.uint32(0x00010001)
        x, y = x_ref[...], y_ref[...]
        for _ in range(chain):
            d = (x | H) - (y & L)
            m = jnp.right_shift(d, 15) & ONE2
            m = (m << 16) - m          # per-field 0xFFFF where x >= y
            y = (y & m) | (x & ~m)
            x = x + ONE2
        o_ref[...] = y

    def build(kernel, dtype):
        def call(x, y):
            return pl.pallas_call(
                kernel,
                grid=(x.shape[1] // tile,),
                in_specs=[pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x, y)
        return call

    rng = np.random.default_rng(9)
    batch = tile * 8
    xf = jnp.asarray(rng.integers(-100, 100, (rows, batch)).astype(np.float32))
    yf = jnp.asarray(rng.integers(-100, 100, (rows, batch)).astype(np.float32))
    xu = jnp.asarray(rng.integers(0, 1 << 15, (rows, batch),
                                  dtype=np.int64).astype(np.uint32)
                     | (rng.integers(0, 1 << 15, (rows, batch),
                                     dtype=np.int64).astype(np.uint32) << 16))
    yu = jnp.asarray(rng.integers(0, 1 << 15, (rows, batch),
                                  dtype=np.int64).astype(np.uint32)
                     | (rng.integers(0, 1 << 15, (rows, batch),
                                     dtype=np.int64).astype(np.uint32) << 16))

    nat = build(native_kernel, jnp.float32)
    swar = build(swar_kernel, jnp.uint32)
    # chained-op throughput in (values × chain-ops)/s — SWAR carries 2
    # values per lane, native 1
    els = rows * batch * chain
    for name, fn, a, b, mult in (("packprobe-native-f", nat, xf, yf, 1),
                                 ("packprobe-swar-min", swar, xu, yu, 2)):
        def run(name=name, fn=fn, a=a, b=b, mult=mult):
            g = jax.jit(lambda u, v: jnp.sum(
                fn(u, v).astype(jnp.float32)).astype(jnp.float32))
            measure_keyed(name,
                          lambda k, aa=a, bb=b: g(
                              aa + jax.random.key_data(k)[0].astype(aa.dtype),
                              bb),
                          els * mult)
        guard(name, run)


def stage_switchprobe(rows=1024, tile=128, steps=256, heavy=64):
    """Does lax.switch inside a Mosaic kernel branch for real, or
    execute every arm? The m15/m16 interp receipts scale with
    steps x branches (m15-interp-decodecount-kl10 19.5K fps, ~20x below
    per-element scaling from m13), which fits all-arms-execute. Three
    kernels, identical fori_loop over a program whose words all select
    the CHEAP arm: (a) lax.switch dispatch, (b) pl.when-chain dispatch,
    (c) no dispatch (cheap op inline). If (a) ~ (c): switch branches
    for real and the interp slowness is elsewhere. If (a) ~ heavy x (c)
    and (b) ~ (c): pl.when is the fix."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    words = np.zeros(steps, np.int32)   # always the cheap arm

    def mk(dispatch):
        def kernel(w_ref, x_ref, o_ref):
            def cheap(_):
                o_ref[...] = o_ref[...] + jnp.float32(1.0)
                return jnp.int32(0)

            def hv(_):
                acc = o_ref[...]
                for _ in range(heavy):
                    acc = jnp.minimum(jnp.abs(acc),
                                      jnp.abs(acc * jnp.float32(1.001)))
                o_ref[...] = acc
                return jnp.int32(0)

            o_ref[...] = x_ref[...]
            arms = [cheap, hv]

            def body(i, c):
                b = w_ref[i]
                if dispatch == "switch":
                    jax.lax.switch(b, arms, jnp.int32(0))
                elif dispatch == "when":
                    for ai, arm in enumerate(arms):
                        @pl.when(b == ai)
                        def _(arm=arm):
                            arm(jnp.int32(0))
                else:
                    cheap(jnp.int32(0))
                return c

            jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        def call(x):
            return pl.pallas_call(
                kernel,
                grid=(x.shape[1] // tile,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(jnp.asarray(words), x)
        return call

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(rows, tile * 8)).astype(np.float32))
    for disp in ("none", "switch", "when"):
        fn = mk(disp)
        g = jax.jit(lambda u, f=fn: jnp.sum(f(u)))

        def run(disp=disp, g=g):
            measure_keyed(f"switchprobe-{disp}",
                          lambda k: g(x + jax.random.key_data(k)[0]
                                      .astype(jnp.float32)),
                          rows * tile * 8 * steps)
        guard(f"switchprobe-{disp}", run)


def stage_switchprobe2(rows=4096, tile=128, steps=256, heavy=64):
    """Which arm FEATURE breaks pl.when branching? interpablate showed
    the real interp kernel pays the all-arms sum per step while the
    static probe (switchprobe) branches fine. Four two-arm kernels,
    words always selecting the CHEAP arm; the heavy arm differs:
    (static) loads+stores at static offsets [control — expect fast];
    (dynld) heavy math on a dynamic-offset load; (dynst) static load,
    store at a dynamic offset; (dynboth). If dyn* measure ~heavy while
    static ~cheap: dynamic-offset access inside a pl.when region forces
    all-arms execution, and the fix is static-slot state layout."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    words = np.zeros(steps, np.int32)   # always the cheap arm

    def mk(variant):
        def kernel(w_ref, x_ref, o_ref, s_ref):
            def cheap(p):
                o_ref[0:8, :] = o_ref[0:8, :] + jnp.float32(1.0)

            def hv(p):
                if variant in ("dynld", "dynboth"):
                    acc = s_ref[pl.ds(pl.multiple_of(p, 8), 8), :]
                else:
                    acc = s_ref[0:8, :]
                for _ in range(heavy):
                    acc = jnp.minimum(jnp.abs(acc),
                                      jnp.abs(acc * jnp.float32(1.001)))
                if variant in ("dynst", "dynboth"):
                    s_ref[pl.ds(pl.multiple_of(p, 8), 8), :] = acc
                else:
                    s_ref[0:8, :] = acc

            s_ref[...] = x_ref[...]
            o_ref[...] = x_ref[...]
            arms = [cheap, hv]

            def body(i, c):
                w = w_ref[i]
                b = jnp.bitwise_and(w, 0xFFFF)
                p = (w >> 16) * 8
                for ai, arm in enumerate(arms):
                    @pl.when(b == ai)
                    def _(arm=arm):
                        arm(p)
                return c

            jax.lax.fori_loop(0, steps, body, jnp.int32(0))
            o_ref[8:16, :] = s_ref[0:8, :]

        def call(x):
            return pl.pallas_call(
                kernel,
                grid=(x.shape[1] // tile,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
                scratch_shapes=[pltpu.VMEM((rows, tile), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(jnp.asarray(words), x)
        return call

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(rows, tile * 8)).astype(np.float32))
    for variant in ("static", "dynld", "dynst", "dynboth"):
        fn = mk(variant)
        g = jax.jit(lambda u, f=fn: jnp.sum(f(u)))

        def run(variant=variant, g=g):
            measure_keyed(f"switchprobe2-{variant}",
                          lambda k: g(x + jax.random.key_data(k)[0]
                                      .astype(jnp.float32)),
                          rows * tile * 8, iters=16)
        guard(f"switchprobe2-{variant}", run)


def stage_switchprobe3(rows=2048, tile=128, steps=363, nops=220):
    """WHICH body feature if-converts a pl.when arm? interparms:
    chain arms branch (k4~k16 = taken-arm cost) but every SSA body arm
    executes unconditionally (+~1-2us/step/body). Two-arm kernels,
    words always taking the CHEAP arm; the heavy arm (never taken)
    varies: (chain) nops sequential elementwise ops, one store —
    mirrors the f/g chunk structure [expect fast]; (concat) the
    _transform shape — recursive halve/mul/concatenate on a (256,T)
    value; (multistore) nops ops with a store every 16 ops; (i8cast)
    chain on int8 loads with f32 compute + int8 store-back like the
    SSA bodies' env.ld/st. The slow variant(s) name the trigger."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    words = np.zeros(steps, np.int32)

    def transform(x):
        n = x.shape[0]
        if n == 1:
            return x
        h = n // 2
        return jnp.concatenate(
            [transform(x[:h] * x[h:]), transform(x[h:])], axis=0)

    def mk(variant):
        def kernel(w_ref, x_ref, o_ref, s_ref):
            def cheap(_):
                o_ref[0:8, :] = o_ref[0:8, :] + jnp.float32(1.0)

            def heavy_chain(_):
                acc = s_ref[0:256, :]
                for _ in range(nops):
                    acc = jnp.minimum(jnp.abs(acc),
                                      jnp.abs(acc * jnp.float32(1.001)))
                s_ref[256:512, :] = acc

            def heavy_concat(_):
                acc = transform(s_ref[0:256, :])
                s_ref[256:512, :] = acc

            def heavy_multistore(_):
                acc = s_ref[0:256, :]
                for i in range(nops):
                    acc = jnp.minimum(jnp.abs(acc),
                                      jnp.abs(acc * jnp.float32(1.001)))
                    if i % 16 == 15:
                        s_ref[256 + 16 * (i // 16):256 + 16 * (i // 16) + 16,
                              :] = acc[0:16, :]
                s_ref[512:768, :] = acc

            def heavy_i8cast(_):
                acc = s_ref[0:256, :]
                for i in range(nops):
                    acc = jnp.minimum(jnp.abs(acc),
                                      jnp.abs(acc * jnp.float32(1.001)))
                    if i % 32 == 31:   # int8 round-trip like env.st/ld
                        i8_ref[0:256, :] = acc.astype(jnp.int8)
                        acc = i8_ref[0:256, :].astype(jnp.float32)
                s_ref[256:512, :] = acc

            s_ref[...] = x_ref[...]
            i8_ref[...] = jnp.zeros_like(i8_ref)
            o_ref[...] = x_ref[...]
            heavy = {"chain": heavy_chain, "concat": heavy_concat,
                     "multistore": heavy_multistore,
                     "i8cast": heavy_i8cast}[variant]
            arms = [cheap, heavy]

            def body(i, c):
                b = jnp.bitwise_and(w_ref[i], 0xFFFF)
                for ai, arm in enumerate(arms):
                    @pl.when(b == ai)
                    def _(arm=arm):
                        arm(jnp.int32(0))
                return c

            jax.lax.fori_loop(0, steps, body, jnp.int32(0))

        def kernel_outer(w_ref, x_ref, o_ref, s_ref, i8r):
            nonlocal i8_ref
            i8_ref = i8r
            kernel(w_ref, x_ref, o_ref, s_ref)

        i8_ref = None

        def call(x):
            return pl.pallas_call(
                kernel_outer,
                grid=(x.shape[1] // tile,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
                scratch_shapes=[pltpu.VMEM((rows, tile), jnp.float32),
                                pltpu.VMEM((rows, tile), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(jnp.asarray(words), x)
        return call

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(rows, tile * 8)).astype(np.float32))
    for variant in ("chain", "concat", "multistore", "i8cast"):
        fn = mk(variant)
        g = jax.jit(lambda u, f=fn: jnp.sum(f(u)))

        def run(variant=variant, g=g):
            measure_keyed(f"switchprobe3-{variant}",
                          lambda k: g(x + jax.random.key_data(k)[0]
                                      .astype(jnp.float32)),
                          rows * tile * 8, iters=16)
        guard(f"switchprobe3-{variant}", run)


def stage_interpablate(m=15, kl=8):
    """WHY is the interp kernel ~50x below per-element scaling at m15?
    The program is an SMEM INPUT, so one compiled kernel can run
    DOCTORED programs: (real) the actual m15-kl8 codeword program;
    (cheap) every step -> the cheapest arm at pos 0; (f-top / g-top)
    every step -> the top-level f (all-STATIC soft offsets) / g (one
    DYNAMIC int8 hard load); (body) every step -> one subtree body
    (dynamic int8 stores). Same step count everywhere, so per-call
    deltas attribute cost to arm classes: cheap ~ real => structural
    per-step cost (dispatch walk); f-top slow => big chunked chain ops;
    g-top >> f-top => dynamic-offset accesses; body slow => SSA-body
    stores."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import polar_tpu as pt
    from polar_tpu.ops.pallas import interp_kernel as ik

    code = pt.make_code(m, rate=0.5)
    tree = ik.compile_code(code)
    kl = min(kl, code.level)
    prog = ik._build_program(tree, kl, want_cw=True, want_u=False)
    words_np = prog.words(kl)
    n = code.N
    tile = 128
    batch = max(256, (1 << 25) // (1 << m))
    vmem = {13: 32, 14: 48, 15: 96, 16: 110}.get(m, 110)
    cdt = jnp.bfloat16 if m >= 16 else jnp.float32

    kernel = functools.partial(ik._interp_kernel_entry, prog, n, kl, cdt,
                               True, False, False, None)
    blk = lambda: pl.BlockSpec((n, tile), lambda i: (0, i),  # noqa: E731
                               memory_space=pltpu.VMEM)

    def call(words, llr_t):
        return pl.pallas_call(
            kernel,
            grid=(llr_t.shape[1] // tile,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk()],
            out_specs=(blk(),),
            out_shape=(jax.ShapeDtypeStruct((n, llr_t.shape[1]), jnp.int8),),
            scratch_shapes=[pltpu.VMEM((2 * n, tile), jnp.int8),
                            pltpu.VMEM((n, tile), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem << 20),
        )(words, llr_t)

    # arm inventory (key -> index), for the doctored programs
    by_key = {key: idx for key, (idx, _) in prog.branches.items()}
    chain_f = sorted((k for k in by_key if k[0] == "f"), key=lambda k: k[1])
    chain_g = sorted((k for k in by_key if k[0] in ("g", "g0")),
                     key=lambda k: k[1])
    bodies = [k for k in by_key if k[0] == "body"]
    cheap_keys = sorted((k for k in by_key
                         if k[0] in ("comb0", "comb", "g0", "g")),
                        key=lambda k: k[1])
    variants = {"real": words_np}
    if cheap_keys:
        variants["cheap"] = np.full_like(words_np, by_key[cheap_keys[0]])
    if chain_f:
        variants["ftop"] = np.full_like(words_np, by_key[chain_f[-1]])
        variants["fmid"] = np.full_like(words_np, by_key[chain_f[0]])
    if chain_g:
        variants["gtop"] = np.full_like(words_np, by_key[chain_g[-1]])
    if bodies:
        variants["body"] = np.full_like(words_np, by_key[bodies[0]])
    log({"cfg": f"m{m}-interpablate-inventory", "steps": len(words_np),
         "branches": len(by_key),
         "arms": {v: int(w[0] & 0xFFFF) for v, w in variants.items()
                  if v != "real"}, "ts": time.time()})

    llr_t = llr_batch(code, batch).T
    for vname, w in variants.items():
        wj = jnp.asarray(w)

        def fn(key, wj=wj):
            d = jax.random.key_data(key).reshape(-1)[0].astype(jnp.int8)
            return call(wj, llr_t + d)

        measure_keyed(f"m{m}-interpablate-{vname}", fn, batch, iters=8)


def stage_interparms(m=15, kl=8):
    """Per-step cost vs BRANCH-TABLE SIZE on the real interp kernel.
    interpablate: taken-arm identity is irrelevant (real == cheap to
    0.01%); switchprobe2: neither arm count 2 nor dynamic offsets slows
    the probe. Bisect on the REAL kernel: build it with the first k
    arms only (words select arm 0 = the top-level f), k doubling to the
    full table. cost(k) linear in the table's total work => Mosaic
    if-converts the chain at some arity/size and executes everything;
    the knee is the trigger."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import polar_tpu as pt
    from polar_tpu.ops.pallas import interp_kernel as ik

    code = pt.make_code(m, rate=0.5)
    tree = ik.compile_code(code)
    kl = min(kl, code.level)
    prog = ik._build_program(tree, kl, want_cw=True, want_u=False)
    n = code.N
    tile = 128
    batch = max(256, (1 << 25) // (1 << m))
    vmem = {13: 32, 14: 48, 15: 96, 16: 110}.get(m, 110)
    cdt = jnp.bfloat16 if m >= 16 else jnp.float32
    n_steps = len(prog.steps)
    words = jnp.asarray(np.zeros(n_steps, np.int32))   # arm 0, pos 0
    llr_t = llr_batch(code, batch).T

    makes = prog.makes()
    blk = lambda: pl.BlockSpec((n, tile), lambda i: (0, i),  # noqa: E731
                               memory_space=pltpu.VMEM)

    ks, k = [], 1
    while k < len(makes):
        ks.append(k)
        k *= 4
    ks.append(len(makes))
    for k in ks:
        subset = makes[:k]

        def kernel(prog_ref, llr_ref, cw_ref, soft, hard, subset=subset):
            env = ik._Env(soft, hard, cw_ref, None, cdt,
                          align=min(1 << kl, ik._CHAIN_CHUNK_ROWS))
            soft[pl.ds(n, n), :] = llr_ref[...].astype(soft.dtype)
            branches = [mk(env) for mk in subset]
            ik._run_program(prog_ref, n_steps, branches, kl)

        def call(llr):
            return pl.pallas_call(
                kernel,
                grid=(llr.shape[1] // tile,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk()],
                out_specs=blk(),
                out_shape=jax.ShapeDtypeStruct((n, llr.shape[1]), jnp.int8),
                scratch_shapes=[pltpu.VMEM((2 * n, tile), jnp.int8),
                                pltpu.VMEM((n, tile), jnp.int8)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=vmem << 20),
            )(words, llr)

        def fn(key):
            d = jax.random.key_data(key).reshape(-1)[0].astype(jnp.int8)
            return call(llr_t + d)

        measure_keyed(f"m{m}-interparms-k{k}", fn, batch, iters=8)


def stage_vmemprobe():
    """Does vmem_limit_bytes raise Mosaic's scoped budget past 16M on
    this chip? Whole-code SSA kernels at sizes known to OOM at the
    default limit: N=16384 t128 (the r2 receipt says live set > 16M) at
    32/64/96M budgets."""
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(14, rate=0.5)
    llrs = llr_batch(code, 2048)
    for v in (None, 32, 64, 96):
        measure(f"m14-wholecode-ssa-t128-v{v or 16}",
                lambda vv=v: pt.make_pallas_decoder(
                    code, frame_tile=128, compute_dtype=jnp.float32,
                    style="ssa", vmem_limit_mb=vv),
                llrs, iters=16)


def stage_lanemajor(ms=(14, 15, 16, 17)):
    """Frame-major vs lane-major hybrid decode (VERDICT r2 weak-5: the
    frame-major champion pays two transposes per subtree-kernel call
    site; the zero-transpose lane-major entry was only ever measured at
    N=1024). Same kl13-t128 config, output=u, int8."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        batch = max(256, (1 << 25) // (1 << m))
        code = pt.make_code(m, rate=0.5)
        dec = pt.make_fastssc_decoder(code, output_dtype=jnp.int8,
                                      kernel_level=13, kernel_frame_tile=128)
        llrs = llr_batch(code, batch)
        measure(f"m{m}-hybrid-framemajor", lambda d=dec: d, llrs, iters=16)
        llr_t = llrs.T
        kpad = code.N - code.K

        def lane_step(x, d=dec, kp=kpad):
            out = d.lane_major(x)                    # (K, B) int8
            return x + jnp.pad(out, ((0, kp), (0, 0))).astype(x.dtype)

        measure_chain(f"m{m}-hybrid-lanemajor", lane_step, llr_t, iters=16)


def stage_sincosab(m=13, batch=4096):
    """Same-process A/B of the poly sincos vs the Mosaic builtins in the
    block front (cross-day step receipts are ±5% noisy; this isolates
    the trig swap with one meter, one machine state)."""
    import jax.numpy as jnp
    import numpy as np

    import polar_tpu as pt
    from polar_tpu.ops.pallas import step_kernel as sk

    code = pt.make_code(m, rate=0.5)

    def builtin_sincos(u):
        theta = jnp.float32(2.0 * np.pi) * u
        return jnp.cos(theta), jnp.sin(theta)

    poly = sk._sincos_2pi
    for name, impl in (("poly", poly), ("builtin", builtin_sincos),
                       ("poly-again", poly)):
        sk._sincos_2pi = impl
        try:
            front = sk.make_pallas_front_blocks(
                code, frame_tile=128, block_level=m - 1, systematic=True)
            measure_keyed(f"m{m}-sincosab-{name}",
                          lambda k, f=front, b=batch: f(k, 0.5, b), batch)
        finally:
            sk._sincos_2pi = poly


def stage_bigm(m=22, batch=8, kl=13, vmem=None):
    """Decode-frontier rung (VERDICT r2 next-6, r4 next-2): one
    noiseless round-trip at m=22+ (N=4M+) through the hybrid,
    recording first-call trace+compile and steady-state times. The r2
    ladder reached m=21 (2055 s first call) and r3 m=22 via kl13
    (4134 s); distinct subtree patterns are jitted once, so the
    ceiling is the XLA top-graph trace. ``kl``/``vmem`` pick the
    subtree rung — kl15-v64 halves the XLA top sites vs kl13 and its
    kernel bodies are the receipted (cached) champions."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    def run():
        code = pt.make_code(m, rate=0.5)
        rng = np.random.default_rng(7)
        msg = (1 - 2 * rng.integers(0, 2, (batch, code.K))).astype(np.int8)
        cw = pt.encode(code, jnp.asarray(msg))
        llr = (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)
        del cw
        dec = jax.jit(pt.make_fastssc_decoder(
            code, output_dtype=jnp.int8, kernel_level=kl,
            kernel_frame_tile=128, kernel_vmem_limit_mb=vmem))
        t0 = time.perf_counter()
        out = np.asarray(dec(llr))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = np.asarray(dec(llr))
        t_second = time.perf_counter() - t0
        log({"cfg": f"m{m}-probe" + ("" if kl == 13 else f"-kl{kl}"),
             "noiseless_roundtrip":
             bool(np.array_equal(out, msg) and np.array_equal(out2, msg)),
             "first_call_s": round(t_first, 1),
             "steady_call_s": round(t_second, 2),
             "frames": batch, "ts": time.time()})

    guard(f"m{m}-probe-kl{kl}", run)


STAGES = {
    "bigm": stage_bigm,
    "sincosab": stage_sincosab,
    "prngrate": stage_prngrate,
    "mathprobe": stage_mathprobe,
    "frontprofile": stage_frontprofile,
    "frontcfg": stage_frontcfg,
    "frontmid": stage_frontmid,
    "decodecount": stage_decodecount,
    "steprate": stage_steprate,
    "stepkl15": stage_stepkl15,
    "countk": stage_countk,
    "lanemajor": stage_lanemajor,
    "fusef": stage_fusef,
    "vmemprobe": stage_vmemprobe,
    "interpablate": stage_interpablate,
    "interparms": stage_interparms,
    "switchprobe": stage_switchprobe,
    "switchprobe2": stage_switchprobe2,
    "switchprobe3": stage_switchprobe3,
    "vmem2": stage_vmem2,
    "klladder": stage_klladder,
    "klcw": stage_klcw,
    "klcwfuse": stage_klcwfuse,
    "interp": stage_interp,
    "interp17": stage_interp17,
    "packprobe": stage_packprobe,
    "biginterp": stage_biginterp,
    "bigminterp": stage_bigm_interp,
    "stepkernel": stage_stepkernel,
    "parity": stage_parity,
    "vmem3": stage_vmem3,
    "m17split": stage_m17split,
    "wrapprofile": stage_wrapprofile,
    "frontcfg2": stage_frontcfg2,
    "frontcfg2step": stage_frontcfg2step,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", help="stage name")
    ap.add_argument("--list", action="store_true", help="list stages")
    ap.add_argument("--ms", type=str, default=None,
                    help="comma-separated m list for stages taking ms=")
    ap.add_argument("--m", type=int, default=None,
                    help="single m for stages taking m=")
    ap.add_argument("--non-systematic", action="store_true",
                    help="systematic=False for stages taking systematic=")
    ap.add_argument("--kls", type=str, default=None,
                    help="comma-separated subtree levels for stages "
                         "taking kls=")
    ap.add_argument("--cbl", type=int, default=None,
                    help="channel-block level for stages taking cbl=")
    ap.add_argument("--kl", type=int, default=None,
                    help="single subtree level for stages taking kl=")
    ap.add_argument("--vmem", type=int, default=None,
                    help="vmem_limit_mb for stages taking vmem=")
    args = ap.parse_args()
    if args.list or not args.stage:
        for name in STAGES:
            print(name)
        return 0
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import inspect

    fn = STAGES[args.stage]
    params = inspect.signature(fn).parameters
    kw = {}
    if args.ms is not None and "ms" in params:
        kw["ms"] = tuple(int(x) for x in args.ms.split(","))
    if args.m is not None and "m" in params:
        kw["m"] = args.m
    if args.non_systematic and "systematic" in params:
        kw["systematic"] = False
    if args.kls is not None and "kls" in params:
        kw["kls"] = tuple(int(x) for x in args.kls.split(","))
    if args.cbl is not None and "cbl" in params:
        kw["cbl"] = args.cbl
    if args.kl is not None and "kl" in params:
        kw["kl"] = args.kl
    if args.vmem is not None and "vmem" in params:
        kw["vmem"] = args.vmem
    fn(**kw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
