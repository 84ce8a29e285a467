#!/bin/bash
# Round-4 TPU batch 2: interpreter-kernel on-chip validation and the
# remaining VERDICT receipts, ordered by decision value.
set -x
cd /root/repo
python scripts/sweep.py --stage interp --ms 13        # sanity vs 3.56M unrolled
python scripts/sweep.py --stage packprobe             # SWAR lane-packing probe
python scripts/sweep.py --stage interp --ms 15,16     # the HTTP-413 blockers
python scripts/sweep.py --stage interp17              # whole-code m17
python scripts/sweep.py --stage klcw --ms 17,18       # extrapolated champions
python scripts/sweep.py --stage biginterp --ms 18     # interp-hybrid kl16/17
python scripts/sweep.py --stage klcwfuse --ms 16,17   # fused-kl15 A/B
echo "BATCH2 DONE"
