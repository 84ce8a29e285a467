#!/bin/bash
# Round-5 TPU batch 2: the fixed/new measurement stages — count-kernel
# A/B under the corrected VMEM budgets, the two-floor step gate, the
# m14 wrapper-penalty profile, the channel-block cap re-probe, the m16
# nonsys HEAD re-receipt, then the m17 two-kernel split (longest
# compiles last). Serial: one python process holds the TPU grant.
set -x
cd /root/repo
python scripts/step_gate.py
python scripts/sweep.py --stage countk --ms 15,16
python scripts/sweep.py --stage wrapprofile
python scripts/sweep.py --stage frontcfg2 --ms 15,16
python scripts/sweep.py --stage steprate --ms 16 --non-systematic
python scripts/sweep.py --stage m17split
echo "BATCH2 DONE"
