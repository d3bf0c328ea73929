#!/bin/bash
# Poll the tunneled TPU until backend init + tiny dispatch succeeds, then
# pre-warm kernels via kernel_sanity. Bounded: ~4h of polling.
cd /root/repo
for i in $(seq 1 48); do
  if timeout 150 python -c "import jax, jax.numpy as jnp; v=float(jnp.ones(())+1); assert v==2.0; print('probe-ok', jax.default_backend())" >> /tmp/tpu_watch.log 2>&1; then
    echo "RECOVERED at attempt $i $(date)" >> /tmp/tpu_watch.log
    timeout 3000 python benchmarks/kernel_sanity.py >> /tmp/tpu_watch.log 2>&1
    echo "kernel_sanity rc=$? $(date)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "probe $i failed $(date)" >> /tmp/tpu_watch.log
  sleep 300
done
echo "GAVE UP $(date)" >> /tmp/tpu_watch.log
exit 1
