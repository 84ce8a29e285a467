#!/bin/bash
# Round-4 TPU batch 6: re-receipt the numbers THROUGHPUT.md/auto.py
# cite whose receipts were lost in the container restart (batch 1/2),
# then the remaining extrapolated-champion measurements. Serial.
set -x
cd /root/repo
python scripts/sweep.py --stage steprate --ms 13,14,15,16
python scripts/sweep.py --stage frontmid --ms 13,15,16
python scripts/sweep.py --stage klcw --ms 17,18
python scripts/sweep.py --stage steprate --ms 13,14,15,16 --non-systematic
python scripts/sweep.py --stage klcwfuse --ms 16,17
echo "BATCH6 DONE"
