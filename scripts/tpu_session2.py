#!/usr/bin/env python
"""Second TPU measurement batch: SSA kernel style, 16-bit dtype retry,
TPU-vs-oracle parity (+ first-call trace/compile receipts), and a
single-shot m=19 feasibility probe (documented practical N ceiling).

Run AFTER the large stage finishes (one TPU process at a time).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import sweep_r2 as S  # noqa: E402


def stage_ssa():
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(10, rate=0.5)
    llrs = S.llr_batch(code, 32768)
    S.measure("n1024-ssa-f32-t512", lambda: pt.make_pallas_decoder(
        code, frame_tile=512, compute_dtype=jnp.float32, style="ssa"), llrs)
    code4k = pt.make_code(12, rate=0.5)
    S.measure("n4096-ssa-f32-t128", lambda: pt.make_pallas_decoder(
        code4k, frame_tile=128, compute_dtype=jnp.float32, style="ssa"),
        S.llr_batch(code4k, 8192))


def stage_m19_probe():
    """One decode + noiseless round-trip at m=19 (N=524288): records
    trace+compile (first call) and a correctness witness — the practical
    ceiling probe, not a throughput claim."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    try:
        code = pt.make_code(19, rate=0.5)
        rng = np.random.default_rng(3)
        msg = (1 - 2 * rng.integers(0, 2, (64, code.K))).astype(np.int8)
        cw = pt.encode(code, jnp.asarray(msg))
        llr = (cw.astype(jnp.int8) * jnp.int8(96)).astype(jnp.int8)
        dec = jax.jit(pt.make_fastssc_decoder(
            code, output_dtype=jnp.int8, kernel_level=11,
            kernel_frame_tile=256))
        t0 = time.perf_counter()
        out = np.asarray(dec(llr))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out2 = np.asarray(dec(llr))
        t_second = time.perf_counter() - t0
        S.log({"cfg": "m19-probe", "noiseless_roundtrip":
               bool(np.array_equal(out, msg)), "first_call_s": round(t_first, 1),
               "steady_call_s": round(t_second, 2),
               "frames": 64, "ts": time.time()})
    except Exception as e:  # noqa: BLE001
        S.log({"cfg": "m19-probe", "error": f"{type(e).__name__}: {e}"[:400],
               "ts": time.time()})


if __name__ == "__main__":
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    S.stage_dtypes()
    stage_ssa()
    S.stage_parity()
    stage_m19_probe()
