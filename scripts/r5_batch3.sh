#!/bin/bash
# Round-5 TPU batch 3: ceiling probe above the never-probed 110M scoped
# budget (three valuable configs OOM at 112-113M), adoption follow-ups,
# the m16 sys re-receipt at the promoted kl15 default, and the m17 BER
# campaign capstone through the shipped dispatch. Serial.
# NOTE: edit parameters per batch-2 receipts before running.
set -x
cd /root/repo
# (the m16/m17 sys steprate rows at HEAD are already receipted this
# round: countk-xla at the promoted default and stepkl15's kl15v110
# measure the identical programs)
python scripts/sweep.py --stage interp17 --kls 12 --vmem 116
python scripts/sweep.py --stage klcwfuse --ms 16 --vmem 116
python scripts/waterfall.py --m 17 --rate 0.5 --batch 256 \
    --max-frames 32768 --out results/n131072_sys_int8.json --retries 2
python bench.py
python scripts/step_gate.py
# the m23 rung via the unrolled kl15 hybrid (cached champion bodies):
# the interp-kl17 attempt's remote compile was SIGKILLed after ~85 min
# of local trace (receipt m23-probe-interpkl17 r5); this is the
# extrapolated ~2x-m22 route. Last: an overrun only costs this item.
python scripts/sweep.py --stage bigm --m 23 --kl 15 --vmem 64
echo "BATCH3 DONE"
