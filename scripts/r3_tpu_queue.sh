#!/bin/bash
# Round-3 TPU work queue: run the moment the tunnel recovers.
# Usage: nohup bash scripts/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# 1. wait for the tunnel
until timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" 2>/dev/null; do
  echo "tunnel down $(date +%H:%M:%S)"; sleep 120
done
echo "TUNNEL UP $(date +%H:%M:%S)"

# 2. kernel microbench: CAT variant vs current
timeout 2400 python -u scripts/exp_conv_cat.py --batch 4 2>&1 | grep -v WARNING

# 3. full train bench with the fused norm pipeline (batch 4 fixed: probe
#    b6 separately later; keep this first measurement comparable to r2)
timeout 3000 python -u bench.py --batch 4 --no-e2e 2>&1 | grep -v WARNING
