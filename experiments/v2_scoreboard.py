"""Full v2-scene decision scoreboard: every matcher family x N seeds
in ONE process (static shapes -> one compile per family; per-seed cost
after warmup is seconds, so an 8-seed sweep is tractable through the
tunnel where 8 bench.py invocations would not be).

Writes results/quality_v2_scoreboard.json (+ prints a family summary).
The committed scoreboard is produced by running this on the chip:

    python experiments/v2_scoreboard.py --seeds 0,1,2,3,4,5,6,7

Reference capability being measured: the semantic gate's end decisions
on a parallax/occlusion/aliasing scene (semantic_evaluation.py:23-66
on the multi-floor aliasing problem of the reference README.md:9-11).

NOTE: the committed superglue row predates the calibrated
confident-match cut that build_verifier now applies by default
(results/superglue_cut.json); regenerating moves that family from the
diagnosis band (~0.38) to the calibrated one (~0.60) — the scoreboard
pin accepts either generation.
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
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument(
        "--families", default="trained,superglue,orb,loftr",
        help="comma list; 'trained' = LightGlue (parallax ckpt)",
    )
    ap.add_argument("--top-k", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--out", default="results/quality_v2_scoreboard.json")
    ap.add_argument(
        "--resume", action="store_true",
        help="load --out if present and skip families already recorded "
        "(each family is checkpointed to --out as soon as it finishes, so "
        "a timeout mid-sweep only loses the family in flight)",
    )
    args = ap.parse_args(argv)

    from mlis_tpu.eval.quality import make_quality_scene_v2, run_gate_quality
    from mlis_tpu.models.weights import (
        default_parallax_loftr_checkpoint,
        default_parallax_matcher_checkpoint,
        default_parallax_superglue_checkpoint,
    )

    seeds = [int(s) for s in args.seeds.split(",")]
    families = args.families.split(",")
    fam_weights = {
        "trained": default_parallax_matcher_checkpoint(),
        "superglue": default_parallax_superglue_checkpoint(),
        "loftr": default_parallax_loftr_checkpoint(),
    }

    scenes = {}
    rows: dict = {"seeds": seeds, "families": {}}
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        if prior.get("seeds") == seeds:
            rows["families"].update(prior.get("families", {}))
            done = [f for f in families if f in rows["families"]]
            families = [f for f in families if f not in rows["families"]]
            print(f"[resume] skipping committed families: {done}",
                  file=sys.stderr, flush=True)
    for seed in seeds:
        t0 = time.time()
        scenes[seed] = make_quality_scene_v2(seed=seed)
        print(
            f"[scene] seed {seed} rendered in {time.time() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

    for fam in families:
        vb = 32 if fam == "loftr" else 256
        per_seed = []
        for seed in seeds:
            t0 = time.time()
            out = run_gate_quality(
                fam, scene=scenes[seed], encoder="trained_vpr_v2",
                top_k=args.top_k, similarity_threshold=args.threshold,
                verify_batch=vb, weights_path=fam_weights.get(fam),
            )
            per_seed.append(
                {k: out[k] for k in (
                    "f1", "precision", "recall", "retrieval_recall",
                )} | {"seed": seed, "weights": out["weights"]}
            )
            print(
                f"[scoreboard] {fam} seed {seed}: f1={out['f1']:.3f} "
                f"p={out['precision']:.3f} r={out['recall']:.3f} "
                f"({out['weights']}) {time.time() - t0:.1f}s",
                file=sys.stderr, flush=True,
            )
        f1s = [r["f1"] for r in per_seed]
        rows["families"][fam] = {
            "f1_mean": round(float(np.mean(f1s)), 3),
            "f1_min": round(float(np.min(f1s)), 3),
            "f1_max": round(float(np.max(f1s)), 3),
            "precision_mean": round(
                float(np.mean([r["precision"] for r in per_seed])), 3
            ),
            "recall_mean": round(
                float(np.mean([r["recall"] for r in per_seed])), 3
            ),
            "weights": per_seed[0]["weights"],
            "per_seed": per_seed,
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({
        f: {k: v for k, v in d.items() if k != "per_seed"}
        for f, d in rows["families"].items()
    }, indent=1))
    return rows


if __name__ == "__main__":
    main()
