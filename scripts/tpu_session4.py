#!/usr/bin/env python
"""Fourth TPU batch: the block-structured zero-transpose front at large N.

The whole-block front kernel (PRNG → LLRs in one VMEM pass) tops out at
N=8192; `make_pallas_front_blocks` restructures the same chain as
per-row-block kernels around a thin element-major XLA middle, so it
tiles at any N. This session measures what that buys end-to-end against
the previous champion (hybrid encode kernel + elementwise channel
kernels: m14 = 477.5K steps/s) and records where the remaining step
time goes.

Stages (run serially — one TPU process at a time):

  python scripts/tpu_session4.py --stage blockfront   # m14..m16 steps/s
  python scripts/tpu_session4.py --stage frontprofile # m14 part timings
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from sweep_r2 import log  # noqa: E402


def _steprate(name, body_fn, batch, iters=32):
    import jax

    from polar_tpu.utils.benchmark import measure_step_rate

    t0 = time.perf_counter()
    try:
        body = body_fn()
        rate = measure_step_rate(body, jax.random.PRNGKey(5), 0.0, batch,
                                 iters=iters)
        log({"cfg": name, "batch": batch, "fps": round(rate, 1),
             "measure_s": round(time.perf_counter() - t0, 1),
             "ts": time.time()})
        return rate
    except Exception as e:  # noqa: BLE001 — record and continue the sweep
        log({"cfg": name, "error": f"{type(e).__name__}: {e}"[:400],
             "ts": time.time()})
        return None


def stage_blockfront():
    """Step rates through the block front + lane-major hybrid decode."""
    import polar_tpu as pt
    from polar_tpu.ber import make_step_body

    for m, batch in ((14, 2048), (15, 1024), (16, 512)):
        code = pt.make_code(m, rate=0.5)
        _steprate(f"m{m}-steprate-blockfront", lambda c=code: make_step_body(
            c, rng="pallas"), batch)
    # the campaign path must dispatch to the same chain at the same rate
    code = pt.make_code(14, rate=0.5)
    from polar_tpu.ber import make_step

    _steprate("m14-makestep-auto", lambda: make_step(code, systematic=True),
              2048)


def stage_countfused():
    """m13 whole-block front with the fused decode+count kernel (the
    cw_hat HBM round trip and XLA counter reductions folded into the
    decode kernel) — against the prior receipt m13-steprate-front
    1.165M steps/s (separate decode + XLA counters)."""
    import polar_tpu as pt
    from polar_tpu.ber import make_step_body

    code = pt.make_code(13, rate=0.5)
    _steprate("m13-steprate-front-countfused",
              lambda: make_step_body(code, rng="pallas"), 4096)


def stage_m13fused():
    """The int8 counter-handoff shrinks the step kernel's VMEM peak (the
    f32 llr/cw no longer outlive the decode): probe whether the all-in-
    one fused step now fits m13-t128 (previous receipt: OOM) and whether
    m12 gains a larger tile."""
    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step

    for m, batch, tile in ((13, 4096, 128), (12, 8192, 256)):
        code = pt.make_code(m, rate=0.5)
        _steprate(f"m{m}-stepkernel-int8cnt-t{tile}",
                  lambda c=code, t=tile: make_pallas_step(
                      c, frame_tile=t, prng="native"), batch)


def stage_nonsys():
    """Fused-step rates in non-systematic mode (u-domain counting) vs
    the threefry XLA chain — the plain-encode twin of the sys receipts."""
    import polar_tpu as pt
    from polar_tpu.ber import make_step_body
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step

    for m, batch, tile in ((10, 32768, 256), (12, 8192, 128)):
        code = pt.make_code(m, rate=0.5)
        _steprate(f"m{m}-stepkernel-nonsys-t{tile}",
                  lambda c=code, t=tile: make_pallas_step(
                      c, frame_tile=t, prng="native", systematic=False),
                  batch)
    code = pt.make_code(10, rate=0.5)
    _steprate("m10-steprate-nonsys-threefry",
              lambda: make_step_body(code, systematic=False,
                                     rng="threefry"), 32768, iters=16)
    # large-N nonsys: block front (u0 track) + u-domain lane_major decode
    for m, batch in ((13, 4096), (14, 2048)):
        code = pt.make_code(m, rate=0.5)
        _steprate(f"m{m}-steprate-nonsys-blockfront",
                  lambda c=code: make_step_body(c, systematic=False,
                                                rng="pallas"), batch)
        _steprate(f"m{m}-steprate-nonsys-threefry",
                  lambda c=code: make_step_body(c, systematic=False,
                                                rng="threefry"), batch)


def stage_frontprofile():
    """Where the m14 block-front step goes: chained-slope timings of the
    front alone, front+decode, and the full step (front + decode +
    XLA counters). Each part is chained with a true data dependency
    (output folded into the next key) so nothing can be elided."""
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ber import make_step_body
    from polar_tpu.decode.fastssc import make_fastssc_decoder
    from polar_tpu.ops.pallas.step_kernel import make_pallas_front_blocks
    from polar_tpu.utils.benchmark import _slope_seconds_per_iter

    m, batch = 14, 2048
    code = pt.make_code(m, rate=0.5)
    front = make_pallas_front_blocks(code, frame_tile=128, block_level=13)
    dec = make_fastssc_decoder(code, output="codeword", output_dtype=jnp.int8,
                               kernel_level=13, kernel_frame_tile=128)

    def chained(fn):
        def runner(k0, it):
            def body(_, k):
                k, sub = jax.random.split(k)
                return jax.random.fold_in(k, fn(sub))

            kout = jax.lax.fori_loop(0, it, body, k0)
            return jnp.sum(jax.random.key_data(kout).astype(jnp.int32))

        runner = jax.jit(runner, static_argnums=(1,))
        key = jax.random.PRNGKey(7)

        def timed(it):
            t0 = time.perf_counter()
            int(runner(key, it))
            return time.perf_counter() - t0

        return _slope_seconds_per_iter(timed, 32)

    def front_only(sub):
        llr_t, cw_t = front(sub, 0.0, batch)
        return (jnp.sum(llr_t.astype(jnp.int32))
                + jnp.sum(cw_t.astype(jnp.int32)))

    def front_dec(sub):
        llr_t, _cw_t = front(sub, 0.0, batch)
        return jnp.sum(dec.lane_major(llr_t).astype(jnp.int32))

    body = make_step_body(code, rng="pallas")

    def full(sub):
        return body(sub, 0.0, batch)["uncorrected_errors"]

    for name, fn in (("front-only", front_only), ("front+dec", front_dec),
                     ("fullstep", full)):
        try:
            s = chained(fn)
            log({"cfg": f"m{m}-blockfront-{name}", "batch": batch,
                 "ms_per_batch": round(s * 1e3, 3),
                 "fps": round(batch / s, 1), "ts": time.time()})
        except Exception as e:  # noqa: BLE001
            log({"cfg": f"m{m}-blockfront-{name}",
                 "error": f"{type(e).__name__}: {e}"[:400],
                 "ts": time.time()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["blockfront", "frontprofile", "countfused",
                             "m13fused", "nonsys"])
    args = ap.parse_args()
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    {"blockfront": stage_blockfront,
     "frontprofile": stage_frontprofile,
     "countfused": stage_countfused,
     "m13fused": stage_m13fused,
     "nonsys": stage_nonsys}[args.stage]()


if __name__ == "__main__":
    main()
