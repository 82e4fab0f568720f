#!/bin/bash
# Round-5 campaign, part 4 (endgame): quality2's encoder section stalled
# past its step timeout after the family rows had already reproduced the
# committed scoreboard bit-for-bit, so only the NEW rows are re-run, in
# verdict-priority order: encoder retrieval rows (4-encoder menu), then
# the SuperGlue confident-match-cut calibration (per-seed checkpointed).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== [$name] start: $* ($(date +%T))" >> /tmp/r5_campaign.log
  if timeout "$t" "$@" > "/tmp/r5_${name}.log" 2>&1; then
    echo "=== [$name] OK ($(date +%T))" >> /tmp/r5_campaign.log
    return 0
  fi
  echo "=== [$name] FAILED rc=$? ($(date +%T))" >> /tmp/r5_campaign.log
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
run encoder_rows 2700 python experiments/encoder_rows.py --seeds 0,1
probe
run superglue_cut 3600 python experiments/superglue_cut.py --seeds 0,1,2,3,4,5,6,7
echo "=== campaign part 4 done ($(date +%T))" >> /tmp/r5_campaign.log
