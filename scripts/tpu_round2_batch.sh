#!/bin/bash
# Post-training TPU batch for round 2 (idempotent — safe to re-run):
#  1. hardware sanity for the round-2 kernel features
#  2. train any missing figure-5 aging snapshots (10 seeds x epochs to 35;
#     skips seeds whose full 6-snapshot series already exists)
#  3. retrain the ml-family checkpoints at the corrected reference
#     architectures (PC 25-128-128 tanh, DLGM hidden 128 / latent 10),
#     skipping ones already produced
#  4. cross-evaluate the reference's shipped torch checkpoints (REF_EVAL.md)
#  5. regenerate figure 5 at full reference scale (epochs to 35, 10 seeds)
#  6. run the benchmark (headline JSON + BENCH_DETAIL.md)
cd "$(dirname "$0")/.."
set -e
python benchmarks/kernel_sanity.py
echo KERNEL_SANITY_DONE
for s in 0 1 2 3 4 5 6 7 8 9; do
  n=$(ls models/epoch_save/mcpc_aging_${s}_epoch* 2>/dev/null | wc -l)
  if [ "$n" -lt 6 ]; then
    python -m montecarlopredictivecoding_tpu.experiments.train_mnist \
      --model mcpc --epochs 35 --seed $((40+s)) \
      --out models/epoch_save/mcpc_aging_$s --snapshot-epochs 0 5 10 15 30 35
    echo AGING_SEED_${s}_DONE
  fi
done
echo AGING_DONE
for s in 1 2 3; do
  [ -f models/pc_ml_$s.msgpack ] || \
    python -m montecarlopredictivecoding_tpu.experiments.train_mnist \
      --model pc --preset ml --epochs 10 --seed $s --out models/pc_ml_$s
  [ -f models/dlgm_ml_$s.msgpack ] || \
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
