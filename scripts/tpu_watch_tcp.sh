#!/bin/bash
# TCP-first TPU recovery watchdog (round 5).
#
# While the tunnel relay is fully down, its claim/init legs
# (127.0.0.1:8082/8083) REFUSE TCP — a connect attempt is instant and free.
# The old watchdog burned a 150 s jax backend probe every 5 min against
# that dead endpoint, so recovery detection lagged up to 7.5 min.  This one
# polls TCP every 20 s and only spends the jax probe when the relay
# answers; on a healthy probe it chains straight into the round-5 runbook
# (gates -> headline bench -> measurements -> transcripts auto-committed).
#
# Usage: tpu_watch_tcp.sh [horizon_seconds]   (default 10 h)
# Env:   LOG (default /tmp/tpu_watch5.log), RELAY_PORT (default 8083,
#        the init leg jax.devices() dials first).
DEADLINE=$(( $(date +%s) + ${1:-36000} ))
LOG=${LOG:-/tmp/tpu_watch5.log}
RELAY_PORT=${RELAY_PORT:-8083}
HEARTBEAT_S=${HEARTBEAT_S:-900}
cd /root/repo
echo "tcp-watchdog start $(date -u), horizon $(( DEADLINE - $(date +%s) ))s, port $RELAY_PORT" >> "$LOG"
REFUSED=0
LAST_BEAT=$(date +%s)
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/$RELAY_PORT" 2>/dev/null; then
    echo "relay TCP open $(date -u); running jax probe" >> "$LOG"
    if timeout 150 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1); assert v==2.0; print('probe-ok', jax.default_backend())" >> "$LOG" 2>&1; then
      echo "RECOVERED $(date -u)" >> "$LOG"
      bash scripts/tpu_runbook_r5.sh >> "$LOG" 2>&1
      echo "RUNBOOK rc=$? $(date -u)" >> "$LOG"
      exit 0
    fi
    # relay answers but the claim/init still hangs (the round-3/4 wedge
    # mode) — back off so repeated half-open probes don't pile up
    echo "relay open but backend probe failed $(date -u)" >> "$LOG"
    sleep 240
  else
    # heartbeat: leave a timestamped outage trail while the relay refuses
    # TCP (otherwise hours of downtime would produce zero log evidence)
    REFUSED=$(( REFUSED + 1 ))
    NOW=$(date +%s)
    if [ $(( NOW - LAST_BEAT )) -ge "$HEARTBEAT_S" ]; then
      echo "relay still refused ($REFUSED checks since last note) $(date -u)" >> "$LOG"
      LAST_BEAT=$NOW
      REFUSED=0
    fi
    sleep 20
  fi
done
echo "tcp-watchdog GAVE UP $(date -u)" >> "$LOG"
exit 1
