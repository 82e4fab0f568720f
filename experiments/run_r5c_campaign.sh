#!/bin/bash
# Round-5 campaign, part 3: SALAD training moved BEFORE the quality2
# bench (its rr_salad row needs the checkpoint; the original attempt
# crashed on the Pallas-VJP bug fixed in d504e89), then the SuperGlue
# confident-match-cut calibration, then the encoder intervention if the
# round still has wall-clock. Sequential — the TPU is single-tenant.
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

probe() {
  until timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))" \
      >> /tmp/r5_campaign.log 2>&1; do
    echo "=== tunnel down, waiting 120s ($(date +%T))" >> /tmp/r5_campaign.log
    sleep 120
  done
  echo "=== tunnel up ($(date +%T))" >> /tmp/r5_campaign.log
}

probe
run salad_train 3600 python -m mlis_tpu.train.pretrain_vpr --arch salad \
  --parallax --steps 4000 --places 8 --views 4 --height 136 --width 180
probe
run quality2 4500 env MLIS_BENCH_MODE=quality2 python bench.py
probe
run superglue_cut 3600 python experiments/superglue_cut.py --seeds 0,1,2,3,4,5,6,7
probe
run intervention 3600 python experiments/encoder_intervention.py --seeds 0,1,2,3
echo "=== campaign part 3 done ($(date +%T))" >> /tmp/r5_campaign.log
