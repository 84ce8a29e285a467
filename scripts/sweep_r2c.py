#!/usr/bin/env python
"""Round-2c TPU measurement session (run serially — one TPU process).

Stages:
  gauge  — why does the campaign's per-point Mb/s gauge (iters=8,
           repeats=1) under-report vs the honest receipt settings?
           Reproduce both measurements back-to-back on the same decoder
           in one process, after campaign-like step() traffic.
  ladder — hybrid subtree kernel-level ladder under the SSA body:
           kl12/kl13 were VMEM-infeasible for the scratch style; the SSA
           live set is smaller, so they may fit and shrink the XLA top
           graph (fewer full-N HBM passes). m=14 and m=15.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sweep_r2 import llr_batch, log, measure  # noqa: E402


def stage_gauge():
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ber import make_step
    from polar_tpu.decode.auto import make_auto_decoder
    from polar_tpu.utils.benchmark import measure_decode_fps

    code = pt.make_code(13, rate=0.5)
    dec, desc = make_auto_decoder(code, output="systematic",
                                  output_dtype=jnp.int8)
    step = make_step(code, systematic=True, decoder=dec)
    key = jax.random.PRNGKey(123)
    t0 = time.perf_counter()
    for _ in range(2):
        key, sub = jax.random.split(key)
        out = jax.device_get(step(sub, 0.5, 4096))
    log({"cfg": "gauge-steps", "desc": desc,
         "step_s": round(time.perf_counter() - t0, 1), "ts": time.time()})
    llrs = llr_batch(code, 4096)
    for name, kw in (("campaign-style-i8r1", dict(iters=8, repeats=1)),
                     ("receipt-style-i64r3", dict(iters=64, repeats=3)),
                     ("campaign-style-i8r1-again", dict(iters=8, repeats=1))):
        t0 = time.perf_counter()
        fps = measure_decode_fps(dec, llrs, **kw)
        log({"cfg": f"m13-sys-gauge-{name}", "fps": round(fps, 1),
             "mbps": round(fps * code.K / 1e6, 1),
             "measure_s": round(time.perf_counter() - t0, 1),
             "ts": time.time()})


def stage_ladder():
    import jax.numpy as jnp

    import polar_tpu as pt

    for m, batch, cfgs in (
        (14, 2048, ((12, 256), (12, 128), (13, 128))),
        (15, 1024, ((12, 256), (13, 128))),
    ):
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        for kl, tile in cfgs:
            measure(
                f"m{m}-hybrid-ssa-kl{kl}-t{tile}",
                lambda c=code, k=kl, t=tile: pt.make_fastssc_decoder(
                    c, output_dtype=jnp.int8, kernel_level=k,
                    kernel_frame_tile=t),
                llrs, iters=32)


def stage_ladder2():
    """kl13 won at m14/m15 (+8%/+14% over kl11): probe kl13-t256 (VMEM
    risk tolerated) and extend kl13-t128 to the m16..18 frontier."""
    import jax.numpy as jnp

    import polar_tpu as pt

    for m, batch, cfgs in (
        (14, 2048, ((13, 256),)),
        (16, 256, ((13, 128),)),
        (17, 256, ((13, 128),)),
        (18, 256, ((13, 128),)),
    ):
        code = pt.make_code(m, rate=0.5)
        llrs = llr_batch(code, batch)
        for kl, tile in cfgs:
            measure(
                f"m{m}-hybrid-ssa-kl{kl}-t{tile}",
                lambda c=code, k=kl, t=tile: pt.make_fastssc_decoder(
                    c, output_dtype=jnp.int8, kernel_level=k,
                    kernel_frame_tile=t),
                llrs, iters=16 if m >= 16 else 32)


def stage_steprate():
    """End-to-end Monte-Carlo step rate vs decode-only rate: the gap is
    the encode+AWGN+counter overhead a fused step kernel could recover.
    If the gap is small, the BACKLOG's step-megakernel idea is dead."""
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.ber import make_step_body
    from polar_tpu.utils.benchmark import measure_step_rate

    for m, batch in ((10, 32768), (13, 4096)):
        code = pt.make_code(m, rate=0.5)
        body = make_step_body(code, systematic=True)
        t0 = time.perf_counter()
        try:
            rate = measure_step_rate(body, jax.random.PRNGKey(5), 0.0, batch,
                                     iters=32)
            log({"cfg": f"m{m}-steprate-sys", "batch": batch,
                 "fps": round(rate, 1),
                 "measure_s": round(time.perf_counter() - t0, 1),
                 "ts": time.time()})
        except Exception as e:  # noqa: BLE001 — record and continue
            log({"cfg": f"m{m}-steprate-sys", "error": f"{type(e).__name__}: {e}",
                 "ts": time.time()})
        # decode-only reference on the same batch size for the ratio
        dec, desc = __import__(
            "polar_tpu.decode.auto", fromlist=["make_auto_decoder"]
        ).make_auto_decoder(code, output="systematic", output_dtype=jnp.int8)
        llrs = llr_batch(code, batch)
        measure(f"m{m}-decodeonly-sys-{desc}", lambda d=dec: d, llrs, iters=32)


def stage_m20_probe():
    """One decode + noiseless round-trip at m=20 (N=1,048,576): kl13
    subtree kernels shrink the XLA top graph 4x vs the kl11 m=19 probe
    (128 leaf subtrees instead of 512 at m=20), so the trace+compile
    ceiling moves up a level. Records first-call and steady-call times
    plus the correctness witness."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    try:
        code = pt.make_code(20, rate=0.5)
        rng = np.random.default_rng(7)
        msg = (1 - 2 * rng.integers(0, 2, (32, code.K))).astype(np.int8)
        cw = pt.encode(code, jnp.asarray(msg))
        llr = (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)
        dec = jax.jit(pt.make_fastssc_decoder(
            code, output_dtype=jnp.int8, kernel_level=13,
            kernel_frame_tile=128))
        t0 = time.perf_counter()
        out = np.asarray(dec(llr))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = np.asarray(dec(llr))
        t_second = time.perf_counter() - t0
        log({"cfg": "m20-probe", "noiseless_roundtrip":
             bool(np.array_equal(out, msg) and np.array_equal(out2, msg)),
             "first_call_s": round(t_first, 1),
             "steady_call_s": round(t_second, 2),
             "frames": 32, "ts": time.time()})
    except Exception as e:  # noqa: BLE001
        log({"cfg": "m20-probe", "error": f"{type(e).__name__}: {e}"[:400],
             "ts": time.time()})


def stage_stepopt():
    """End-to-end step-rate with (a) bool-domain counters (no int32
    elementwise products) and (b) the hardware RngBitGenerator PRNG
    ("rbg" keys — threefry's bit mixing is ~10 VPU ops/word and the
    steprate receipts show RNG+chain overhead at ~90% of the step after
    the fused-cw decode)."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ber import make_step_body
    from polar_tpu.utils.benchmark import measure_step_rate

    for m, batch in ((10, 32768), (13, 4096)):
        code = pt.make_code(m, rate=0.5)
        body = make_step_body(code, systematic=True)
        for name, key in (
            ("boolcnt", jax.random.PRNGKey(5)),
            ("boolcnt-rbg", jax.random.key(5, impl="rbg")),
        ):
            t0 = time.perf_counter()
            try:
                rate = measure_step_rate(body, key, 0.0, batch, iters=32)
                log({"cfg": f"m{m}-steprate-sys-{name}", "batch": batch,
                     "fps": round(rate, 1),
                     "measure_s": round(time.perf_counter() - t0, 1),
                     "ts": time.time()})
            except Exception as e:  # noqa: BLE001
                log({"cfg": f"m{m}-steprate-sys-{name}",
                     "error": f"{type(e).__name__}: {e}"[:300],
                     "ts": time.time()})


def stage_stepkernel():
    """The fused Monte-Carlo step kernel on the real chip: native-PRNG
    sanity (high-SNR zero errors; noisy-SNR BER vs the XLA step within
    binomial tolerance) and step rate across tiles/sizes."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step
    from polar_tpu.utils.benchmark import measure_step_rate

    # -- sanity: counters behave on the real chip (native PRNG path) ----
    code = pt.make_code(10, rate=0.5)
    try:
        fused = jax.jit(make_pallas_step(code, frame_tile=256,
                                         prng="native"),
                        static_argnums=(2,))
        clean = {k: int(v) for k, v in
                 jax.device_get(fused(jax.random.PRNGKey(1), 12.0, 4096)).items()}
        noisy = {k: int(v) for k, v in
                 jax.device_get(fused(jax.random.PRNGKey(2), -1.0, 4096)).items()}
        xla = pt.make_step(code, systematic=True, fused=False)
        noisy_ref = {k: int(v) for k, v in
                     jax.device_get(xla(jax.random.PRNGKey(3), -1.0, 4096)).items()}
        log({"cfg": "stepkernel-native-sanity", "clean": clean,
             "noisy": noisy, "noisy_xla": noisy_ref, "ts": time.time()})
    except Exception as e:  # noqa: BLE001
        log({"cfg": "stepkernel-native-sanity",
             "error": f"{type(e).__name__}: {e}"[:600], "ts": time.time()})
        return

    # -- step rate across tiles and sizes ------------------------------
    for m, batch, tiles in ((10, 32768, (256, 512)), (13, 4096, (128,)),
                            (8, 32768, (512,))):
        code = pt.make_code(m, rate=0.5)
        for tile in tiles:
            t0 = time.perf_counter()
            try:
                body = make_pallas_step(code, frame_tile=tile, prng="native")
                rate = measure_step_rate(body, jax.random.PRNGKey(5), 0.0,
                                         batch, iters=32)
                log({"cfg": f"m{m}-stepkernel-native-t{tile}", "batch": batch,
                     "fps": round(rate, 1),
                     "measure_s": round(time.perf_counter() - t0, 1),
                     "ts": time.time()})
            except Exception as e:  # noqa: BLE001
                log({"cfg": f"m{m}-stepkernel-native-t{tile}",
                     "error": f"{type(e).__name__}: {e}"[:400],
                     "ts": time.time()})


def stage_stepkernel2():
    """Fused step at the m11/m12 frontier (m13 t128 OOMs VMEM — probe
    receipt) + the make_step auto dispatch end-to-end: the campaign path
    must actually hit the kernel and match its direct rate."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ber import make_step
    from polar_tpu.ops.pallas.step_kernel import make_pallas_step
    from polar_tpu.utils.benchmark import measure_step_rate

    for m, batch, tile in ((11, 16384, 256), (12, 8192, 128)):
        code = pt.make_code(m, rate=0.5)
        t0 = time.perf_counter()
        try:
            body = make_pallas_step(code, frame_tile=tile, prng="native")
            rate = measure_step_rate(body, jax.random.PRNGKey(5), 0.0,
                                     batch, iters=32)
            log({"cfg": f"m{m}-stepkernel-native-t{tile}", "batch": batch,
                 "fps": round(rate, 1),
                 "measure_s": round(time.perf_counter() - t0, 1),
                 "ts": time.time()})
        except Exception as e:  # noqa: BLE001
            log({"cfg": f"m{m}-stepkernel-native-t{tile}",
                 "error": f"{type(e).__name__}: {e}"[:300],
                 "ts": time.time()})
    # the auto dispatch (campaign path): same kernel, same rate expected
    code = pt.make_code(10, rate=0.5)
    step = make_step(code, systematic=True)
    t0 = time.perf_counter()
    rate = measure_step_rate(step, jax.random.PRNGKey(6), 0.0, 32768,
                             iters=32)
    log({"cfg": "m10-makestep-auto-fused", "batch": 32768,
         "fps": round(rate, 1),
         "measure_s": round(time.perf_counter() - t0, 1), "ts": time.time()})


def stage_chanrng():
    """Kernel-RNG step rates at large N (the threefry wall: XLA chain at
    m13 ran at 11% of decode-only). make_step auto now draws message
    symbols and AWGN LLRs with the elementwise hardware-PRNG kernels and
    keeps the hybrid decoder — measure the recovered fraction."""
    import jax

    import polar_tpu as pt
    from polar_tpu.ber import make_step, make_step_body
    from polar_tpu.utils.benchmark import measure_step_rate

    for m, batch in ((13, 4096), (14, 2048)):
        code = pt.make_code(m, rate=0.5)
        for name, body in (
            ("chanrng", make_step_body(code, rng="pallas")),
            ("threefry", make_step_body(code, rng="threefry")),
        ):
            t0 = time.perf_counter()
            try:
                rate = measure_step_rate(body, jax.random.PRNGKey(5), 0.0,
                                         batch, iters=32)
                log({"cfg": f"m{m}-steprate-{name}", "batch": batch,
                     "fps": round(rate, 1),
                     "measure_s": round(time.perf_counter() - t0, 1),
                     "ts": time.time()})
            except Exception as e:  # noqa: BLE001
                log({"cfg": f"m{m}-steprate-{name}",
                     "error": f"{type(e).__name__}: {e}"[:400],
                     "ts": time.time()})
    # auto dispatch at m13 must pick the kernel-RNG body
    code = pt.make_code(13, rate=0.5)
    step = make_step(code, systematic=True)
    t0 = time.perf_counter()
    rate = measure_step_rate(step, jax.random.PRNGKey(6), 0.0, 4096,
                             iters=32)
    log({"cfg": "m13-makestep-auto", "batch": 4096, "fps": round(rate, 1),
         "measure_s": round(time.perf_counter() - t0, 1), "ts": time.time()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["gauge", "ladder", "ladder2", "steprate",
                             "m20probe", "stepopt", "stepkernel",
                             "stepkernel2", "chanrng"])
    args = ap.parse_args()
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    {"gauge": stage_gauge, "ladder": stage_ladder,
     "ladder2": stage_ladder2, "steprate": stage_steprate,
     "m20probe": stage_m20_probe, "stepopt": stage_stepopt,
     "stepkernel": stage_stepkernel,
     "stepkernel2": stage_stepkernel2, "chanrng": stage_chanrng}[args.stage]()


if __name__ == "__main__":
    main()
