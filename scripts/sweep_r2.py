#!/usr/bin/env python
"""Round-2 TPU measurement session (run serially — one TPU process).

Covers VERDICT r1 items: N=1024 re-measure with the cached-abs kernel
(#5), hybrid kernel_level/tile sweep at m=15 with the sign-free kernel
(weak #1), large-N frontier m=16..18 receipts with trace/compile times
(#1), and a fresh N=32768 receipt (#8).

Appends machine-readable receipt lines to
results/throughput_receipts_r2.txt as it goes (compile wedges are
per-config tolerated).

  python scripts/sweep_r2.py --stage n1024   # kernel re-measure + tiles
  python scripts/sweep_r2.py --stage m15     # hybrid sweep at N=32768
  python scripts/sweep_r2.py --stage large   # m=16..18 receipts
  python scripts/sweep_r2.py --stage parity  # TPU-vs-oracle bit checks
"""

from __future__ import annotations

import argparse
import json
import time
import traceback
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RECEIPTS = Path(__file__).resolve().parent.parent / "results" / \
    "throughput_receipts_r2.txt"


def log(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(RECEIPTS, "a") as f:
        f.write(line + "\n")


def measure(name, mk_decoder, llrs, iters=64, **kw):
    from polar_tpu.utils.benchmark import measure_decode_fps

    t0 = time.perf_counter()
    try:
        dec = mk_decoder()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        fps = measure_decode_fps(dec, llrs, iters=iters, **kw)
        t_meas = time.perf_counter() - t0
        log({"cfg": name, "batch": int(llrs.shape[0]), "n": int(llrs.shape[1]),
             "fps": round(fps, 1), "build_s": round(t_build, 1),
             "measure_s": round(t_meas, 1), "ts": time.time()})
        return fps
    except Exception as e:  # noqa: BLE001 — record and continue the sweep
        log({"cfg": name, "error": f"{type(e).__name__}: {e}",
             "trace": traceback.format_exc()[-600:], "ts": time.time()})
        return None


def llr_batch(code, batch, seed=42):
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(-128, 128, (batch, code.N)).astype(np.int8))


def stage_n1024():
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(10, rate=0.5)
    llrs = llr_batch(code, 32768)
    for tile in (512, 256, 1024):
        measure(f"pallas-f32-t{tile}-cachedabs", lambda t=tile: pt.make_pallas_decoder(
            code, frame_tile=t, compute_dtype=jnp.float32), llrs)
    # medium-N check with the new kernel
    code4k = pt.make_code(12, rate=0.5)
    llrs4k = llr_batch(code4k, 8192)
    for tile in (128, 256):
        measure(f"n4096-pallas-f32-t{tile}-cachedabs",
                lambda t=tile: pt.make_pallas_decoder(
                    code4k, frame_tile=t, compute_dtype=jnp.float32), llrs4k)


def stage_m15():
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(15, rate=0.5)
    llrs = llr_batch(code, 1024)
    for kl in (11, 12):
        for tile in (256, 128):
            measure(
                f"m15-hybrid-kl{kl}-t{tile}",
                lambda k=kl, t=tile: pt.make_fastssc_decoder(
                    code, output_dtype=jnp.int8, kernel_level=k,
                    kernel_frame_tile=t),
                llrs, iters=32)


def stage_large(ms=(16, 17, 18), kl=11, tile=256):
    import jax.numpy as jnp

    import polar_tpu as pt

    for m in ms:
        code = pt.make_code(m, rate=0.5)
        batch = max(256, (1 << 23) // code.N)
        llrs = llr_batch(code, batch)
        measure(
            f"m{m}-hybrid-kl{kl}-t{tile}",
            lambda c=code, k=kl, t=tile: pt.make_fastssc_decoder(
                c, output_dtype=jnp.int8, kernel_level=k,
                kernel_frame_tile=t),
            llrs, iters=16)


def stage_dtypes():
    """Retry 16-bit kernel compute (VERDICT r1 #10): int16 and bfloat16
    variants crashed the remote compile helper in round 1; record whether
    a fresh session compiles them and how they measure."""
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(10, rate=0.5)
    llrs = llr_batch(code, 32768)
    for dt, name in ((jnp.int16, "int16"), (jnp.bfloat16, "bf16"),
                     (jnp.int32, "int32")):
        measure(f"n1024-pallas-{name}-t512", lambda d=dt: pt.make_pallas_decoder(
            code, frame_tile=512, compute_dtype=d), llrs, iters=32)


def stage_parity(ms=(13, 15, 16)):
    """TPU decode vs the CPU reference oracle, bit for bit (W=32 batch),
    through the hybrid path, plus a noiseless round-trip at every m."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import oracle

    w = oracle.width()
    rng = np.random.default_rng(7)
    for m in ms:
        code = pt.make_code(m, rate=0.5)
        dec = jax.jit(pt.make_fastssc_decoder(
            code, output_dtype=jnp.int8, kernel_level=11,
            kernel_frame_tile=256))
        t0 = time.perf_counter()
        llr = rng.integers(-128, 128, (w, code.N)).astype(np.int8)
        ours = np.asarray(dec(jnp.asarray(llr)))
        t_first = time.perf_counter() - t0
        ref = oracle.decode(m, code.frozen, llr) if m <= 18 else None
        ok = bool(np.array_equal(ours, ref)) if ref is not None else None
        # noiseless round-trip on a bigger batch
        msg = (1 - 2 * rng.integers(0, 2, (512, code.K))).astype(np.int8)
        cw = pt.encode(code, jnp.asarray(msg))
        llr_clean = (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)
        rt = bool(np.array_equal(np.asarray(dec(llr_clean)), msg))
        log({"cfg": f"m{m}-parity", "oracle_bitexact": ok,
             "noiseless_roundtrip": rt,
             "first_call_s": round(t_first, 1), "ts": time.time()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["n1024", "m15", "large", "parity", "dtypes"])
    args = ap.parse_args()
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    {"n1024": stage_n1024, "m15": stage_m15, "large": stage_large,
     "parity": stage_parity, "dtypes": stage_dtypes}[args.stage]()


if __name__ == "__main__":
    main()
