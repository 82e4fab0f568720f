#!/bin/bash
# Round-5 campaign, part 2: the original run_r5_campaign.sh scoreboard
# step could not fit the LoFTR family's dense compile inside its timeout
# on a cold server-side cache (ORB seeds alone ran ~230 s each through
# the tunnel). This resumes the scoreboard (per-family checkpointing +
# --resume landed in v2_scoreboard.py) and runs the remaining chip jobs
# in verdict-priority order. Sequential — the TPU is single-tenant.
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
# LoFTR family on the v2 scoreboard (resume: other families salvaged) +
# the v1 held-out de-leak sweep, ONE process so any shared shapes share
# a compile.
run loftr_jobs 4500 python - <<'EOF'
import sys
sys.path.insert(0, "experiments")
import v2_scoreboard, loftr_heldout
v2_scoreboard.main(["--resume", "--seeds", "0,1,2,3,4,5,6,7",
                    "--families", "trained,superglue,orb,loftr"])
loftr_heldout.main(["--seeds", "4,5,6,7"])
EOF

# retrieval_recall back-fill for salvaged families (encoder-determined,
# identical across families on the same scene/seed).
python - <<'EOF'
import json
p = "results/quality_v2_scoreboard.json"
rows = json.load(open(p))
fams = rows["families"]
src = fams.get("loftr")
if src:
    rr = {e["seed"]: e["retrieval_recall"] for e in src["per_seed"]}
    for fam, d in fams.items():
        for e in d["per_seed"]:
            if e.get("retrieval_recall") is None:
                e["retrieval_recall"] = rr.get(e["seed"])
    json.dump(rows, open(p, "w"), indent=1)
    print("[fixup] retrieval_recall back-filled from loftr rows")
EOF

probe
run rerank 3000 python experiments/rerank_quality.py --seeds 0,1,2,3
probe
run roofline 2700 env MLIS_BENCH_MODE=roofline python bench.py
probe
run roofline_fullres 2700 env MLIS_BENCH_MODE=roofline \
  MLIS_BENCH_ROOFLINE_RES=fullres python bench.py
probe
run salad_train 4500 python -m mlis_tpu.train.pretrain_vpr --arch salad \
  --parallax --steps 4000 --places 8 --views 4 --height 136 --width 180
probe
run quality2 4500 env MLIS_BENCH_MODE=quality2 python bench.py
probe
run intervention 3600 python experiments/encoder_intervention.py --seeds 0,1,2,3
echo "=== campaign part 2 done ($(date +%T))" >> /tmp/r5_campaign.log
