#!/usr/bin/env python
"""Reproduce results/THROUGHPUT.md: decode frames/s per code length.

Measures the auto-selected champion decoder (and optionally the XLA
path) per N with the honest chained-slope method, and — when run on a
host with the reference mounted — the AVX2 reference via the test
oracle's `bench` command.

  python scripts/throughput.py --ms 6 8 10 12 14
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def reference_fps(m: int) -> float | None:
    try:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
        import subprocess

        import oracle

        import polar_tpu as pt

        iters = max(1000, min(400000, 1 << (28 - 2 * m + 10)))
        frozen = pt.make_code(m, rate=0.5).frozen
        r = subprocess.run(
            [str(oracle.oracle_path()), "bench", str(m), str(iters)],
            input=frozen.tobytes(), stdout=subprocess.PIPE, check=True,
        )
        return float(r.stdout)
    except Exception:
        return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ms", type=int, nargs="+", default=[6, 8, 10, 12, 14])
    ap.add_argument("--with-xla", action="store_true")
    ap.add_argument("--with-reference", action="store_true")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    import polar_tpu as pt
    from polar_tpu.utils.benchmark import measure_decode_fps
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(5)
    for m in args.ms:
        code = pt.make_code(m, rate=0.5)
        batch = max(1024, min(131072, (1 << 25) // code.N))
        llrs = jnp.asarray(
            rng.integers(-128, 128, (batch, code.N)).astype(np.int8)
        )
        dec, desc = pt.make_auto_decoder(code)
        row = f"N={code.N:6d} [{desc}]"
        try:
            fps = measure_decode_fps(dec, llrs, iters=args.iters)
            row += f" {fps:14,.0f} frames/s"
        except Exception as e:
            row += f" FAILED ({type(e).__name__})"
        if args.with_xla:
            try:
                fps = measure_decode_fps(
                    pt.make_fastssc_decoder(code, output_dtype=jnp.int8),
                    llrs, iters=args.iters,
                )
                row += f" | xla {fps:14,.0f}"
            except Exception as e:
                row += f" | xla FAILED ({type(e).__name__})"
        if args.with_reference:
            ref = reference_fps(m)
            if ref:
                row += f" | avx2 ref {ref:14,.0f}"
        print(row, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
