#!/bin/bash
# Round-5 measurement campaign: every remaining chip job, sequential
# (the TPU is single-tenant), each with a bounded timeout and one retry.
# Logs land in /tmp/r5_*.log; artifacts in results/ + checkpoints/.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  for attempt in 1 2; do
    echo "=== [$name] attempt $attempt: $* ($(date +%T))" >> /tmp/r5_campaign.log
    if timeout "$t" "$@" > "/tmp/r5_${name}.log" 2>&1; then
      echo "=== [$name] OK ($(date +%T))" >> /tmp/r5_campaign.log
      return 0
    fi
    echo "=== [$name] FAILED rc=$? ($(date +%T))" >> /tmp/r5_campaign.log
    sleep 30
  done
  return 1
}

# tunnel probe: don't burn job timeouts while the tunnel is down
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))" \
    >> /tmp/r5_campaign.log 2>&1; do
  echo "=== tunnel down, waiting 120s ($(date +%T))" >> /tmp/r5_campaign.log
  sleep 120
done
echo "=== tunnel up ($(date +%T))" >> /tmp/r5_campaign.log

run scoreboard 4500 python experiments/v2_scoreboard.py --seeds 0,1,2,3,4,5,6,7
run rerank 3000 python experiments/rerank_quality.py --seeds 0,1,2,3
run loftr_heldout 2400 python experiments/loftr_heldout.py --seeds 4,5,6,7
run salad_train 4500 python -m mlis_tpu.train.pretrain_vpr --arch salad \
  --parallax --steps 4000 --places 8 --views 4 --height 136 --width 180
run roofline 2700 env MLIS_BENCH_MODE=roofline python bench.py
run roofline_fullres 2700 env MLIS_BENCH_MODE=roofline \
  MLIS_BENCH_ROOFLINE_RES=fullres python bench.py
run intervention 3600 python experiments/encoder_intervention.py --seeds 0,1,2,3
run quality2 4500 env MLIS_BENCH_MODE=quality2 python bench.py
echo "=== campaign done ($(date +%T))" >> /tmp/r5_campaign.log
