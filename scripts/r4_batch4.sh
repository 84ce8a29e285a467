#!/bin/bash
# Round-4 TPU batch 4: interp kernels with the chunked chain ops and
# measured VMEM budgets (batch 3 receipts), then the klcw/biginterp
# re-receipts. Serial — one python process holds the TPU grant.
set -x
cd /root/repo
python scripts/sweep.py --stage interp --ms 13
python scripts/sweep.py --stage interp --ms 15
python scripts/sweep.py --stage interp --ms 16
python scripts/sweep.py --stage interp17
echo "BATCH4 DONE"
