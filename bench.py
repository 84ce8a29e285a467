"""North-star benchmark: decoded frames/s/chip at N=1024 rate-1/2 (int8).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "frames/s", "vs_baseline": ...}

``vs_baseline`` is the ratio against the unmodified AVX2 reference decoder
measured on this host via the test oracle's ``bench`` command
(tests/oracle, reference decode loop timed like ``testbench.cc:170-174``):
Polar(1024, 512), random full-range int8 LLRs → 2,517,424 frames/s
(measured 2026-08-16, g++ -O2 -march=native, 32 SIMD lanes).
BASELINE.json's target is ≥10× this on one v5e chip.
"""

import json
import sys
import time

import numpy as np

AVX2_REFERENCE_FPS_N1024 = 2_517_424.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    import polar_tpu as pt

    code = pt.make_code(10, rate=0.5)
    decode = jax.jit(pt.make_fastssc_decoder(code))

    batch = 16384
    rng = np.random.default_rng(42)
    llrs = jnp.asarray(rng.integers(-128, 128, (batch, code.N)).astype(np.int8))

    decode(llrs).block_until_ready()  # compile (excluded, like testbench)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(llrs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    fps = batch / dt

    print(
        json.dumps(
            {
                "metric": "decoded frames/s/chip, Polar(1024,512) int8 Fast-SSC",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / AVX2_REFERENCE_FPS_N1024, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
