"""Decision-quality A/B for keypoint pruning at the FULLRES protocol.

The half-res GT-scene sweep showed detect-1024/match-512 is
decision-neutral (BENCH_NOTES "Keypoint pruning adopted in the half-res
protocol"). This measures the same question at the bench's fullres
protocol (540x720, detect 2048): is matching only the top-512 (or 1024)
keypoints by detector score decision-neutral on the GT quality scene?

Chip job (CPU is too slow at 540x720): run with the default axon
platform, ~one fresh compile per (hw, match_top_k) shape.

Usage: python experiments/fullres_pruning_quality.py [seeds...]
Writes one JSON line per (seed, match_top_k) to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlis_tpu.eval.quality import make_quality_scene, run_gate_quality

HW = (540, 720)
DETECT = 2048


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    for seed in seeds:
        scene = make_quality_scene(n_places=8, hw=HW, seed=seed)
        # the established fullres protocol is 2048->1024; the open
        # question is whether 512 (the matcher's training budget) is
        # decision-neutral vs 1024 at this resolution
        for mtk in (512, 1024):
            t0 = time.time()
            r = run_gate_quality(
                "trained",
                scene=scene,
                hw=HW,
                max_keypoints=DETECT,
                match_top_k=mtk,
                seed=seed,
            )
            out = {
                "seed": seed,
                "match_top_k": mtk or DETECT,
                "f1": round(r["f1"], 4),
                "precision": round(r["precision"], 4),
                "recall": round(r["recall"], 4),
                "retrieval_recall": round(r.get("retrieval_recall", -1), 4),
                "wall_s": round(time.time() - t0, 1),
            }
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
