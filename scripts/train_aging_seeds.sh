#!/bin/bash
# Train the figure-5 developmental-study snapshot series for seeds 0-9 at
# full reference scale: epoch snapshots {init,5,10,15,30,35}
# (reference figure_5.py:74,92-93 -> 60 files).
cd "$(dirname "$0")/.."
for s in 0 1 2 3 4 5 6 7 8 9; do
  python -m montecarlopredictivecoding_tpu.experiments.train_mnist --model mcpc --epochs 35 \
    --out models/epoch_save/mcpc_aging_$s --seed $((40+s)) --snapshot-epochs 0 5 10 15 30 35
done
echo AGING_DONE
