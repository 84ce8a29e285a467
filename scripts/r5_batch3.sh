#!/bin/bash
# Round-5 TPU batch 3: the m17 BER campaign capstone first (its step
# compiles are cached — the promoted kl15 default IS the measured
# config), then the 116M ceiling probes on the configs that OOM'd
# 2-3M over 110M, the driver gates, and the m23 rung attempt last
# (an overrun only costs that item). Serial.
set -x
cd /root/repo
python scripts/waterfall.py --m 17 --rate 0.5 --batch 256 \
    --max-frames 32768 --out results/n131072_sys_int8.json --retries 2
python scripts/sweep.py --stage interp17 --kls 12 --vmem 116
# the kl16 split kernel OOM'd at 115.98M vs the 110M cap; re-probe at
# 120M (chip has 128M physical; no receipt has ever probed above 110)
python scripts/sweep.py --stage m17split --vmem 120
python bench.py
python scripts/step_gate.py
python scripts/sweep.py --stage klcwfuse --ms 16 --vmem 116
# the m23 rung via the unrolled kl15 hybrid (cached champion bodies):
# the interp-kl17 attempt's remote compile was SIGKILLed after ~85 min
# of local trace (receipt m23-probe-interpkl17 r5); this is the
# extrapolated ~2x-m22 route. Last: an overrun only costs this item.
python scripts/sweep.py --stage bigm --m 23 --kl 15 --vmem 64
echo "BATCH3 DONE"
