#!/bin/bash
# Round-5 hardware runbook — run the moment the TPU recovers (chained from
# the watchdog so evidence lands even unattended).  Stages log to
# /tmp/r5_<stage>.log; stops on a failing GATE but continues through
# independent measurement stages; finishes by copying every transcript into
# hw_transcripts/r5/ and COMMITTING, so the round record survives a
# re-wedge or round end.
# Timeouts are last-resort: a SIGTERM mid-dispatch can wedge the chip for
# hours (round-3 incident) — they are sized generously above any observed
# stage time.
cd /root/repo
set -x
date -u
# gates first (kernel_sanity also pre-warms every kernel variant's compile;
# leg 13 adds up to 3 NEW cold Mosaic compiles at 15+ min worst case each —
# size the timeout so SIGTERM never lands mid-compile)
timeout 5400 python benchmarks/kernel_sanity.py > /tmp/r5_kernel_sanity.log 2>&1 || { echo "KERNEL_SANITY FAILED"; bash scripts/collect_r5.sh; exit 1; }
timeout 3000 python benchmarks/hw_parity.py > /tmp/r5_hw_parity.log 2>&1 || { echo "HW_PARITY FAILED"; bash scripts/collect_r5.sh; exit 1; }
# headline immediately after gates: the driver re-captures bench.py at round
# end, and a late-stage wedge must not leave the headline unverified.
# The runbook isn't under the driver's 25-min window, so give the supervisor
# a budget that covers a fully COLD T=10000 Mosaic compile — this run warms
# /tmp/jax_tpu_cache, so the driver's own capture later stays fast.
MCPC_BENCH_BUDGET_S=5000 timeout 5400 python bench.py > /tmp/r5_bench.log 2>&1
bash scripts/collect_r5.sh  # land the headline + gates before the long tail
# measurements (independent; don't stop on failure)
timeout 5400 python benchmarks/trainstep_bench.py > /tmp/r5_trainstep.log 2>&1
timeout 7200 python benchmarks/chain_roofline.py > /tmp/r5_roofline.log 2>&1
timeout 7200 python benchmarks/bf16_ab.py > /tmp/r5_bf16_ab.log 2>&1
# up to 24 cold Mosaic kernel compiles (4 variants x 3 batches x 2 chain
# lengths; T is a static kernel param) — size the timeout so SIGTERM never
# lands mid-compile (the round-3 wedge cause)
timeout 7200 python benchmarks/noise_prefetch_ab.py > /tmp/r5_prefetch.log 2>&1
# final health check: leave the chip verified-healthy for the driver capture
timeout 600 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1); assert v==2.0; print('final-probe-ok', jax.default_backend())" > /tmp/r5_final_probe.log 2>&1
bash scripts/collect_r5.sh
date -u
echo RUNBOOK_DONE
