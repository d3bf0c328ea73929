#!/bin/bash
# Second probe-gated resumable runner for the round-5 leftovers after the
# 04:47 UTC flap killed noise_prefetch_ab mid-table:
#   1. fresh headline bench  — bench.py now reports the chip-rate headline
#      (K-chain marginal, commit 6acf7f9); the landed 03:49 transcript
#      predates that, so BENCH_DETAIL.md should match HEAD's bench.py.
#   2. noise-variant A/B at B=1024,4096 (B=256 landed: prefetch x0.719,
#      rsqrt x1.002 — see /tmp/r5_prefetch.log).
#   3. bf16 A/B confirmation cell at B=4096 (separate report file).
# Same stage logic as tpu_tail_r5.sh: wait for a healthy probe before each
# stage, skip stages whose log already carries the success marker, commit
# transcripts after every stage.
#
# Usage: tpu_tail2_r5.sh [horizon_seconds]   (default 3.5 h)
cd /root/repo
DEADLINE=$(( $(date +%s) + ${1:-12600} ))

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
# fresh headline with the chip-rate marginal (success = JSON, no error field)
if grep -a '"vs_baseline"' /tmp/r5_bench2.log 2>/dev/null | grep -qv '"error"'; then
  echo "$(date -u) skip bench2 (headline JSON already present)"
else
  wait_up && {
    echo "$(date -u) running bench2"
    MCPC_BENCH_BUDGET_S=1100 timeout 1500 python bench.py > /tmp/r5_bench2.log 2>&1
    bash scripts/collect_r5.sh
  }
fi
stage prefetch_wide NOISE_AB_DONE 7200 \
  python benchmarks/noise_prefetch_ab.py --batches 1024,4096
stage bf16_4096 "wrote BF16_AB_4096.md" 7200 \
  python benchmarks/bf16_ab.py --batches 4096 --out BF16_AB_4096.md
bash scripts/collect_r5.sh
date -u
echo TAIL2_DONE
