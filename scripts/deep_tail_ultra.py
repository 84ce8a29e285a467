#!/usr/bin/env python
"""Ultra-deep N=1024 BER tail on the fused step kernel (TPU).

The round-1 deep-tail receipt resolved Polar(1024,512) to BER 7.5e-9
with 1M frames/point (~3 min on-chip, XLA-chain steps). The fused
Monte-Carlo step kernel (16.4M steps/s) with on-device multi-step
chaining makes 1e9 frames/point cost ~70 s, resolving the tail three
decades deeper — sampling depth the reference testbench cannot reach
(1e9 frames of Polar(1024,512) at its 917 Mbit/s peak would take ~10
minutes PER POINT on a full AVX2 host for the decode alone, with the
scalar chain around it dominating on top).

Checkpointed per point (results/n1024_tail_ultra.json) — safe to
re-run; completed points are skipped.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "results" / "n1024_tail_ultra.json"
RECEIPTS = REPO / "results" / "throughput_receipts_r2.txt"

SNRS = [1.6, 1.8, 2.0, 2.2, 2.4, 2.6]
BATCH = 32768
STEPS_PER_CALL = 32          # 32*32768*N(1024) = 2^30 channel bits/call
                             # < int32 (the awgn/quant diagnostics count
                             # over N, not K — the binding domain)
MAX_FRAMES = 1 << 30         # ~1.07e9 frames/point
TARGET_ERRS = 100


def main():
    import json

    import jax

    import polar_tpu as pt
    from polar_tpu.ber import CampaignResult, make_multi_step, run_point
    from polar_tpu.campaign_io import load_result, save_result
    from polar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    code = pt.make_code(10, rate=0.5)
    result = load_result(OUT) or CampaignResult(
        code_n=code.N, code_k=code.K, systematic=True, seed=2024)
    done = {round(p.snr_db, 6) for p in result.points}
    multi = make_multi_step(code)        # fused kernel via auto dispatch
    key = jax.random.PRNGKey(2024)
    for snr in SNRS:
        key, sub = jax.random.split(key)
        if round(snr, 6) in done:
            continue
        t0 = time.time()
        p = run_point(code, snr, key=sub, step=multi, batch=BATCH,
                      max_frames=MAX_FRAMES, target_bit_errors=TARGET_ERRS,
                      steps_per_call=STEPS_PER_CALL)
        result.points.append(p)
        result.points.sort(key=lambda q: q.snr_db)
        save_result(result, OUT)
        line = json.dumps({
            "cfg": f"n1024-tail-ultra-snr{snr}", "frames": p.frames,
            "bit_errors": p.bit_errors, "ber": p.ber,
            "point_s": round(time.time() - t0, 1), "ts": time.time()})
        print(line, flush=True)
        with open(RECEIPTS, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
