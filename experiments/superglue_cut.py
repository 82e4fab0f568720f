"""Calibrate a confident-match cut for the SuperGlue family on the v2
scene (round-5 scoreboard finding: superglue_parallax runs at recall
~0.80 but precision ~0.25 — the repeated-structure false pairs that the
LightGlue branch kills with min_confident_matches=6 are RANSAC-passing
unchecked, because build_verifier never applied the cut to SuperGlue).

One chip run per seed captures per-pair (is_valid, num_confident_matches)
via run_gate_quality(return_pairs=True); the cut is a pure host-side AND,
so the threshold sweep is exact and free offline. Selection on seeds 0-3,
validation on held-out 4-7 (same discipline as the LoFTR coarse-threshold
de-leak). Writes results/superglue_cut.json.

Reference row being measured: geometric_verification.py:353-421
(SuperGlue) on the aliasing problem of the reference README.md:9-11.

Committed run (chip):

    python experiments/superglue_cut.py --seeds 0,1,2,3,4,5,6,7
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

CUTS = (0, 2, 4, 6, 8, 10, 12, 16, 20, 24)


def _score(pairs, gt_pairs, cut):
    accepted = {
        (min(p["q"], p["m"]), max(p["q"], p["m"]))
        for p in pairs
        if p["is_valid"]
        and (p["num_confident_matches"] < 0
             or p["num_confident_matches"] >= cut)
    }
    gt = {(min(a, b), max(a, b)) for a, b in gt_pairs}
    tp = len(accepted & gt)
    fp = len(accepted - gt)
    fn = len(gt - accepted)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {"precision": round(prec, 3), "recall": round(rec, 3),
            "f1": round(f1, 3)}


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--select-seeds", default="0,1,2,3")
    ap.add_argument("--top-k", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--out", default="results/superglue_cut.json")
    args = ap.parse_args(argv)

    from mlis_tpu.eval.quality import make_quality_scene_v2, run_gate_quality
    from mlis_tpu.models.weights import default_parallax_superglue_checkpoint

    seeds = [int(s) for s in args.seeds.split(",")]
    select = [int(s) for s in args.select_seeds.split(",")]
    holdout = [s for s in seeds if s not in select]
    w = default_parallax_superglue_checkpoint()

    per_seed = {}
    for seed in seeds:
        t0 = time.time()
        scene = make_quality_scene_v2(seed=seed)
        out = run_gate_quality(
            "superglue", scene=scene, encoder="trained_vpr_v2",
            top_k=args.top_k, similarity_threshold=args.threshold,
            verify_batch=256, weights_path=w, return_pairs=True,
        )
        per_seed[seed] = {
            "pairs": out["pairs"],
            "gt_pairs": sorted(
                (min(a, b), max(a, b)) for a, b in scene.gt_pairs
            ),
            "weights": out["weights"],
            "retrieval_recall": out["retrieval_recall"],
        }
        print(
            f"[sg-cut] seed {seed}: uncut f1={out['f1']:.3f} "
            f"p={out['precision']:.3f} r={out['recall']:.3f} "
            f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True,
        )
        # checkpoint raw per-pair capture after every seed: a timeout
        # mid-sweep keeps the completed seeds' evidence (the cut sweep
        # itself is free offline)
        os.makedirs("results", exist_ok=True)
        with open(args.out + ".partial", "w") as f:
            json.dump({str(s): d for s, d in per_seed.items()}, f)

    sweep = {}
    for cut in CUTS:
        rows = {
            s: _score(d["pairs"], d["gt_pairs"], cut)
            for s, d in per_seed.items()
        }
        sweep[cut] = {
            "select_f1_mean": round(
                float(np.mean([rows[s]["f1"] for s in select])), 3),
            "holdout_f1_mean": round(
                float(np.mean([rows[s]["f1"] for s in holdout])), 3
            ) if holdout else None,
            "per_seed": rows,
        }
        print(f"[sg-cut] cut={cut}: select={sweep[cut]['select_f1_mean']} "
              f"holdout={sweep[cut]['holdout_f1_mean']}",
              file=sys.stderr, flush=True)

    best = max(CUTS, key=lambda c: sweep[c]["select_f1_mean"])
    res = {
        "scene": "v2 (parallax/occlusion/aliasing)",
        "weights": per_seed[seeds[0]]["weights"],
        "select_seeds": select,
        "holdout_seeds": holdout,
        "cuts": {str(c): sweep[c] for c in CUTS},
        "chosen_cut": best,
        "chosen_select_f1": sweep[best]["select_f1_mean"],
        "chosen_holdout_f1": sweep[best]["holdout_f1_mean"],
        "uncut_holdout_f1": sweep[0]["holdout_f1_mean"],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "cuts"}, indent=1))
    return res


if __name__ == "__main__":
    main()
