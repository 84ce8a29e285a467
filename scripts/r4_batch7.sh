#!/bin/bash
# Round-4 TPU batch 7: counter-kernel A/B, in-loop kl15 A/B, gates,
# then the frontier probes. Serial.
set -x
cd /root/repo
python scripts/sweep.py --stage countk --ms 15,16
python scripts/sweep.py --stage stepkl15 --ms 16,17
python bench.py
python scripts/step_gate.py
python scripts/sweep.py --stage interp17 --kls 12
python scripts/sweep.py --stage bigminterp
echo "BATCH7 DONE"
