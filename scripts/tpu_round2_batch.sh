#!/bin/bash
# Post-training TPU batch for round 2:
#  1. retrain the ml-family checkpoints at the corrected reference
#     architectures (PC 25-128-128 tanh, DLGM hidden 128 / latent 10)
#  2. cross-evaluate the reference's shipped torch checkpoints (REF_EVAL.md)
#  3. regenerate figure 5 at full reference scale (epochs to 35, 10 seeds)
#  4. run the benchmark (headline JSON + BENCH_DETAIL.md)
cd "$(dirname "$0")/.."
set -e
python benchmarks/kernel_sanity.py
echo KERNEL_SANITY_DONE
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
