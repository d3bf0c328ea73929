#!/bin/bash
# Probe-gated, RESUMABLE round-5 measurement runner.
#
# The chip/tunnel flaps: it served the gates for 17 min (03:11-03:28 UTC)
# then went unresponsive mid-round.  The original runbook would let a tail
# stage hang into its multi-hour timeout against a wedged backend; this
# runner instead (1) waits for a healthy short-timeout probe before EVERY
# stage (TCP-first, so a dead relay costs 30 s polls, not 150 s probes),
# (2) skips stages whose /tmp log already carries their success marker, so
# re-runs after a flap resume where they left off, and (3) commits
# transcripts after every stage via scripts/collect_r5.sh.
#
# Usage: tpu_tail_r5.sh [horizon_seconds]   (default 3 h)
cd /root/repo
DEADLINE=$(( $(date +%s) + ${1:-10800} ))

probe() {
  timeout 150 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1.0); assert v==2.0" >/dev/null 2>&1
}

wait_up() {
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8083" 2>/dev/null; then
      probe && return 0
      echo "$(date -u) relay open, backend probe failed; backoff 120s"
      sleep 120
    else
      echo "$(date -u) relay TCP refused; poll 30s"
      sleep 30
    fi
  done
  return 1
}

# stage <name> <success-marker> <timeout> <cmd...>
stage() {
  local name=$1 marker=$2 tmo=$3; shift 3
  if grep -aq "$marker" "/tmp/r5_${name}.log" 2>/dev/null; then
    echo "$(date -u) skip $name (marker '$marker' already present)"
    return 0
  fi
  wait_up || { echo "$(date -u) DEADLINE waiting for backend before $name"; return 1; }
  echo "$(date -u) running $name (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  if grep -aq "$marker" "/tmp/r5_${name}.log"; then
    echo "$(date -u) $name OK"
  else
    echo "$(date -u) $name FAILED rc=$rc (marker absent)"
  fi
  bash scripts/collect_r5.sh
  return 0
}

date -u
# gates (skipped when already green this round)
stage kernel_sanity KERNEL_SANITY_PASS 5400 python benchmarks/kernel_sanity.py
stage hw_parity HW_PARITY_OK 3000 python benchmarks/hw_parity.py
# headline: success = a JSON line with "vs_baseline" and no "error" field
if grep -a '"vs_baseline"' /tmp/r5_bench.log 2>/dev/null | grep -qv '"error"'; then
  echo "$(date -u) skip bench (headline JSON already present)"
else
  wait_up && {
    echo "$(date -u) running bench"
    MCPC_BENCH_BUDGET_S=3000 timeout 3600 python bench.py > /tmp/r5_bench.log 2>&1
    bash scripts/collect_r5.sh
  }
fi
stage trainstep TRAINSTEP_BENCH_DONE 5400 python benchmarks/trainstep_bench.py
stage roofline "wrote ROOFLINE.md" 7200 python benchmarks/chain_roofline.py
stage bf16_ab "wrote BF16_AB.md" 7200 python benchmarks/bf16_ab.py
stage prefetch NOISE_AB_DONE 7200 python benchmarks/noise_prefetch_ab.py
stage final_probe final-probe-ok 600 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1); assert v==2.0; print('final-probe-ok', jax.default_backend())"
bash scripts/collect_r5.sh
date -u
echo TAIL_DONE
