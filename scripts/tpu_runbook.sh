#!/bin/bash
# Round-4 hardware runbook: run after the TPU recovers (pre-warmed by
# /tmp/tpu_watch.sh). Each stage logs to /tmp/r4_<stage>.log; stops on the
# first failing GATE but continues through independent measurement stages.
cd /root/repo
set -x
date
# gates first
timeout 3000 python benchmarks/kernel_sanity.py > /tmp/r4_kernel_sanity.log 2>&1 || { echo "KERNEL_SANITY FAILED"; exit 1; }
timeout 3000 python benchmarks/hw_parity.py > /tmp/r4_hw_parity.log 2>&1 || { echo "HW_PARITY FAILED"; exit 1; }
# measurements (independent; don't stop on failure)
timeout 7200 python benchmarks/chain_roofline.py > /tmp/r4_roofline.log 2>&1
timeout 7200 python benchmarks/bf16_ab.py > /tmp/r4_bf16_ab.log 2>&1
timeout 5400 python benchmarks/noise_prefetch_ab.py > /tmp/r4_prefetch.log 2>&1
timeout 3000 python bench.py > /tmp/r4_bench.log 2>&1
timeout 5400 python -m montecarlopredictivecoding_tpu.experiments.figure_5 --full > /tmp/r4_fig5.log 2>&1
date
echo RUNBOOK_DONE
