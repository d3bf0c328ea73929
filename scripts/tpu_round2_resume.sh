#!/bin/bash
# Resume of the round-2 TPU batch: seeds 0-5 of the aging study are done,
# ml-family retrain / ref_eval / figure_5 --full / bench still pending.
cd "$(dirname "$0")/.."
set -e
python benchmarks/kernel_sanity.py
echo KERNEL_SANITY_DONE
for s in 6 7 8 9; do
  python -m montecarlopredictivecoding_tpu.experiments.train_mnist --model mcpc --epochs 35 \
    --out models/epoch_save/mcpc_aging_$s --seed $((40+s)) --snapshot-epochs 0 5 10 15 30 35
  echo AGING_SEED_${s}_DONE
done
echo AGING_DONE
for s in 1 2 3; do
  python -m montecarlopredictivecoding_tpu.experiments.train_mnist \
    --model pc --preset ml --epochs 10 --seed $s --out models/pc_ml_$s
  python -m montecarlopredictivecoding_tpu.experiments.train_mnist \
    --model dlgm --preset ml --epochs 10 --seed $s --out models/dlgm_ml_$s
done
echo ML_RETRAIN_DONE
python benchmarks/ref_eval.py
echo REF_EVAL_DONE
python -m montecarlopredictivecoding_tpu.experiments.figure_5 --full
echo FIGURE5_DONE
python bench.py
echo TPU_BATCH_DONE
