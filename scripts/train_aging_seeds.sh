#!/bin/bash
# Train the figure-5 developmental-study snapshot series for seeds 1-9.
cd "$(dirname "$0")/.."
for s in 1 2 3 4 5 6 7 8 9; do
  python -m montecarlopredictivecoding_tpu.experiments.train_mnist --model mcpc --epochs 15 \
    --out models/epoch_save/mcpc_aging_$s --seed $((40+s)) --snapshot-epochs 0 5 10 15
done
echo AGING_DONE
