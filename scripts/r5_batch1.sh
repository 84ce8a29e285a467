#!/bin/bash
# Round-5 TPU batch 1: the round-4 plan that never executed (VERDICT r4
# next-1/2) — driver-visible gates first, then the adoption A/Bs that
# close the empty gates, then the frontier probes. Serial: one python
# process holds the TPU grant at a time.
set -x
cd /root/repo
python bench.py
python scripts/step_gate.py
python scripts/sweep.py --stage countk --ms 16,15
python scripts/sweep.py --stage stepkl15 --ms 16,17
python scripts/sweep.py --stage interp17 --kls 12
python scripts/sweep.py --stage bigminterp
python scripts/sweep.py --stage klcwfuse --ms 16,17
echo "BATCH1 DONE"
