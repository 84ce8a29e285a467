#!/bin/bash
# Round-4 TPU batch 7: driver-visible gates first (bench, step gate),
# then the adoption A/Bs, then the frontier probes. Serial.
set -x
cd /root/repo
python bench.py
python scripts/step_gate.py
python scripts/sweep.py --stage countk --ms 16,15
python scripts/sweep.py --stage stepkl15 --ms 16,17
python scripts/sweep.py --stage interp17 --kls 12
python scripts/sweep.py --stage bigminterp
echo "BATCH7 DONE"
