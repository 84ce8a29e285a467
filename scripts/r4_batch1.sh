#!/bin/bash
# Round-4 TPU measurement batch 1: re-receipt the step rates at HEAD
# (after the middle_mode regression fix), A/B the mask-free kernel
# middle, then the extrapolated-champion receipts (VERDICT r3 next-1/4).
# Stages run serially — one python process holds the TPU grant.
set -x
cd /root/repo
python scripts/sweep.py --stage steprate --ms 13,14,15,16
python scripts/sweep.py --stage steprate --ms 13,14,15,16 --non-systematic
python scripts/sweep.py --stage frontmid --ms 13,15,16
python scripts/sweep.py --stage klcw --ms 17,18
echo "BATCH1 DONE"
