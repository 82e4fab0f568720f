"""Decision-quality A/B at the FULLRES protocol: matcher trained at
270x360 (the shipped default) vs matcher trained at 540x720/1024 kpt
(`pretrain_matcher --height 540 --width 720 --kpts 1024 --init-from
<shipped>`).

Motivation (BENCH_NOTES "Fullres pruning 2048->512"): fullres GT-scene
F1 ~0.75 sits well under the half-res ~0.88 because the shipped matcher
trains at 270x360 — the same train/eval resolution gap that capped
LoFTR v1. Chip job (CPU too slow at 540x720).

Usage: python experiments/fullres_matcher_quality.py [seeds...]
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
MATCH_TOP_K = 1024
_CKPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints"
)
FULLRES_CKPT = os.path.join(_CKPTS, "lightglue_homog_sp_fullres.npz")
# pin the half-res checkpoint EXPLICITLY: run_gate_quality's default at
# hw >= 540 is the fullres checkpoint once it ships, so weights_path=None
# would compare the fullres matcher against itself
HALFRES_CKPT = os.path.join(_CKPTS, "lightglue_homog_sp.npz")


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [0, 1, 2]
    for seed in seeds:
        scene = make_quality_scene(n_places=8, hw=HW, seed=seed)
        for name, wp in (
            ("halfres_trained", HALFRES_CKPT),
            ("fullres_trained", FULLRES_CKPT),
        ):
            t0 = time.time()
            r = run_gate_quality(
                "trained",
                scene=scene,
                hw=HW,
                max_keypoints=DETECT,
                match_top_k=MATCH_TOP_K,
                seed=seed,
                weights_path=wp,
            )
            print(json.dumps({
                "seed": seed,
                "ckpt": name,
                "weights": r.get("weights", ""),
                "f1": round(r["f1"], 4),
                "precision": round(r["precision"], 4),
                "recall": round(r["recall"], 4),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
