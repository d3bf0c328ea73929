#!/bin/bash
# Round-4 hardware runbook: run after the TPU recovers (pre-warmed by
# /tmp/tpu_watch.sh). Each stage logs to /tmp/r4_<stage>.log; stops on the
# first failing GATE but continues through independent measurement stages.
# bench.py runs RIGHT AFTER the gates: the driver re-captures it at round
# end, and a late-stage wedge must not leave the headline unverified.
cd /root/repo
set -x
date
# gates first
timeout 3000 python benchmarks/kernel_sanity.py > /tmp/r4_kernel_sanity.log 2>&1 || { echo "KERNEL_SANITY FAILED"; exit 1; }
timeout 3000 python benchmarks/hw_parity.py > /tmp/r4_hw_parity.log 2>&1 || { echo "HW_PARITY FAILED"; exit 1; }
# headline immediately after gates
timeout 3600 python bench.py > /tmp/r4_bench.log 2>&1
# measurements (independent; don't stop on failure)
timeout 7200 python benchmarks/chain_roofline.py > /tmp/r4_roofline.log 2>&1
timeout 7200 python benchmarks/bf16_ab.py > /tmp/r4_bf16_ab.log 2>&1
timeout 5400 python benchmarks/noise_prefetch_ab.py > /tmp/r4_prefetch.log 2>&1
timeout 5400 python -m montecarlopredictivecoding_tpu.experiments.figure_5 --full > /tmp/r4_fig5.log 2>&1
# final health check: leave the chip verified-healthy for the driver's capture
timeout 600 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1); assert v==2.0; print('final-probe-ok', jax.default_backend())" > /tmp/r4_final_probe.log 2>&1
date
echo RUNBOOK_DONE
