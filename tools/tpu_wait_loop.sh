#!/bin/bash
# Retry TPU backend init until the axon tunnel is back, then run the
# serialized measurement session (tools/tpu_session.py). One client at a
# time; probe failures back off 300 s.
#   nohup bash tools/tpu_wait_loop.sh > /tmp/tswait.log 2>&1 & echo $! > /tmp/tswait.pid
cd "$(dirname "$0")/.."
while true; do
  echo "[$(date -u +%H:%M:%S)] probing tunnel..."
  timeout 1200 python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
print('devices', jax.devices(), flush=True)
x = jnp.ones((256, 256))
print('probe-sum', float(jnp.sum(x @ x)), flush=True)
" && break
  echo "[$(date -u +%H:%M:%S)] tunnel down; retry in 300s"
  sleep 300
done
echo "[$(date -u +%H:%M:%S)] tunnel up — starting session"
python tools/tpu_session.py
echo "[$(date -u +%H:%M:%S)] session finished"
