#!/bin/bash
# Round-4 TPU batch 3 (fresh container: empty compile cache, the batch-2
# receipts file was lost uncommitted — decision-value order, interp
# first: if the interpreter kernels win at m15/m16 the steprate
# champions change, so steprate re-receipts run AFTER wiring winners).
set -x
cd /root/repo
python scripts/sweep.py --stage interp --ms 13        # sanity vs 3.56M unrolled
python scripts/sweep.py --stage packprobe             # SWAR lane-packing probe
python scripts/sweep.py --stage interp --ms 15        # the HTTP-413 blocker
python scripts/sweep.py --stage interp --ms 16
python scripts/sweep.py --stage interp17              # whole-code m17 via interp
echo "BATCH3 DONE"
