#!/usr/bin/env python
"""Randomized parity fuzz vs the reference oracle (receipt generator).

Samples random (N, K, pe) codes across the full parameter space and
checks construction / program / decode parity against the unmodified
reference headers (built on demand by tests/oracle). Mask parity is
asserted wherever the selection boundary is resolvable (see
tests/test_fuzz.py docstring for the saturated-tie analysis).

  python scripts/fuzz_parity.py --iters 400 --seed 777
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--max-m", type=int, default=12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    import oracle
    import polar_tpu as pt
    from polar_tpu.decode.fastssc import make_fastssc_decoder

    rng = np.random.default_rng(args.seed)
    w = oracle.width()
    hard_fails = 0
    tie_skips = 0
    for it in range(args.iters):
        m = int(rng.integers(2, args.max_m + 1))
        n = 1 << m
        k = int(rng.integers(1, n))
        pe = float(rng.uniform(0.02, 0.98))
        mask = pt.frozen_mask_fixed_k(m, k, pe)
        lp, lq = pt.bhattacharyya_dual(m, pe)
        order = np.lexsort((np.arange(n), -lq, lp))
        if lp[order[k - 1]] < -1e-9:
            if not np.array_equal(mask, oracle.freezek(m, k, pe)):
                print(f"[{it}] MASK mismatch m={m} k={k} pe={pe}")
                hard_fails += 1
        else:
            tie_skips += 1
        code = pt.PolarCode(m, mask)
        if code.K == 0:
            continue
        if not np.array_equal(pt.compile_program(code),
                              oracle.progcompile(m, mask)):
            print(f"[{it}] PROGRAM mismatch m={m} k={k}")
            hard_fails += 1
            continue
        if m <= 10:
            dec = jax.jit(make_fastssc_decoder(code, output_dtype=jnp.int8))
            llr = rng.integers(-128, 128, (w, n)).astype(np.int8)
            if not np.array_equal(np.asarray(dec(jnp.asarray(llr))),
                                  oracle.decode(m, mask, llr)):
                print(f"[{it}] DECODE mismatch m={m} k={code.K}")
                hard_fails += 1
        if it and it % 50 == 0:
            print(f"...{it}/{args.iters}", file=sys.stderr, flush=True)
    print(f"fuzz: {args.iters} codes, hard failures={hard_fails}, "
          f"saturated-tie skips={tie_skips}")
    return 1 if hard_fails else 0


if __name__ == "__main__":
    sys.exit(main())
