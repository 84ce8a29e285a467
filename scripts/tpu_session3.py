#!/usr/bin/env python
"""Third TPU batch: SSA tile sweep + whole-code SSA reach probe.

The SSA style has no scratch buffers, so tiles/sizes that OOM'd the
scratch pyramid may fit (compiler-managed lifetimes). Sweep tiles at the
championship Ns and probe whole-code SSA at N=8192/16384 (the scratch
style needed the hybrid above N=4096).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import sweep_r2 as S  # noqa: E402


def main():
    import jax.numpy as jnp

    import polar_tpu as pt

    # tile sweep at N=1024 (champion t512 = 56.1M)
    code = pt.make_code(10, rate=0.5)
    llrs = S.llr_batch(code, 32768)
    for tile in (256, 1024):
        S.measure(f"n1024-ssa-f32-t{tile}", lambda t=tile: pt.make_pallas_decoder(
            code, frame_tile=t, compute_dtype=jnp.float32, style="ssa"), llrs)
    # small N
    for m, tile, batch in ((6, 1024, 65536), (8, 512, 65536)):
        c = pt.make_code(m, rate=0.5)
        S.measure(f"n{c.N}-ssa-f32-t{tile}",
                  lambda cc=c, t=tile: pt.make_pallas_decoder(
                      cc, frame_tile=t, compute_dtype=jnp.float32,
                      style="ssa"), S.llr_batch(c, batch))
    # N=4096 alternative tile
    c12 = pt.make_code(12, rate=0.5)
    S.measure("n4096-ssa-f32-t256", lambda: pt.make_pallas_decoder(
        c12, frame_tile=256, compute_dtype=jnp.float32, style="ssa"),
        S.llr_batch(c12, 8192))
    # whole-code SSA reach: N=8192 / N=16384 (scratch style could not fit)
    for m, tile in ((13, 128), (14, 128)):
        c = pt.make_code(m, rate=0.5)
        S.measure(f"n{c.N}-ssa-f32-t{tile}",
                  lambda cc=c, t=tile: pt.make_pallas_decoder(
                      cc, frame_tile=t, compute_dtype=jnp.float32,
                      style="ssa"), S.llr_batch(c, 4096 if m == 13 else 2048),
                  iters=32)


if __name__ == "__main__":
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    main()
