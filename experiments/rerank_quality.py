"""CricaVPR patch-correlation rerank measured on REAL features.

The reference's flagship anti-aliasing mechanism is CricaVPR's
cross-image correlation rerank (place_recognition.py:669-757). Round 4
scored it only over a data-starved from-scratch ViT-B backbone
(held-out recall@1 0.203 ~ chance; checkpoints/vpr_crica_log.json), so
the measurement said nothing. This experiment runs the SAME rerank over
the parallax-trained tiny encoder (checkpoints/vpr_tiny_v2.npz,
held-out recall 0.64; train/pretrain_vpr.load_crica_tiny_vpr) on the v2
GT scene: retrieval recall / aliased rate and END-decision F1, rerank
off vs on, across seeds.

Writes results/rerank_scoreboard.json. Committed run:

    python experiments/rerank_quality.py --seeds 0,1,2,3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2,3")
    ap.add_argument("--top-k", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--out", default="results/rerank_scoreboard.json")
    args = ap.parse_args(argv)

    from mlis_tpu.eval.quality import (
        make_quality_scene_v2,
        retrieval_metrics,
        run_gate_quality_rerank,
    )
    from mlis_tpu.models.weights import default_parallax_matcher_checkpoint
    from mlis_tpu.train.pretrain_vpr import load_crica_tiny_vpr

    seeds = [int(s) for s in args.seeds.split(",")]
    lg_weights = default_parallax_matcher_checkpoint()
    crica = load_crica_tiny_vpr()
    assert crica is not None, "vpr_tiny_v2.npz missing"

    per_seed = []
    for seed in seeds:
        t0 = time.time()
        sc = make_quality_scene_v2(seed=seed)
        row = {"seed": seed}
        for on in (False, True):
            m = retrieval_metrics(
                sc, crica, top_k=args.top_k, threshold=args.threshold,
                rerank=on,
            )
            e = run_gate_quality_rerank(
                sc, rerank=on, crica=crica, top_k=args.top_k,
                similarity_threshold=args.threshold,
                weights_path=lg_weights,
            )
            tag = "on" if on else "off"
            row[f"rr_{tag}"] = round(m["retrieval_recall"], 3)
            row[f"aliased_{tag}"] = round(m["aliased_rate"], 3)
            row[f"f1_{tag}"] = round(e["f1"], 3)
            row[f"precision_{tag}"] = round(e["precision"], 3)
            row[f"recall_{tag}"] = round(e["recall"], 3)
        per_seed.append(row)
        print(
            f"[rerank] seed {seed}: rr {row['rr_off']}->{row['rr_on']} "
            f"f1 {row['f1_off']}->{row['f1_on']} "
            f"({time.time() - t0:.1f}s)",
            file=sys.stderr, flush=True,
        )

    out = {
        "backbone": "vpr_tiny_v2 (parallax-trained, held-out recall 0.64)",
        "matcher": lg_weights,
        "top_k": args.top_k,
        "threshold": args.threshold,
        "seeds": seeds,
        "per_seed": per_seed,
    }
    for k in ("rr_off", "rr_on", "f1_off", "f1_on",
              "aliased_off", "aliased_on"):
        out[f"{k}_mean"] = round(
            float(np.mean([r[k] for r in per_seed])), 3
        )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_seed"},
                     indent=1))
    return out


if __name__ == "__main__":
    main()
