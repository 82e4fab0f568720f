"""Paper figure reproductions (Kaveti et al. CASE 2023 Figures 6 & 7).

Figure 6: perceptual-aliasing view — the multi-floor trajectory in 3D with
loop-closure candidate edges, green same-floor vs red cross-floor
(reference scripts/visualization/generate_figures.py:111-199).

Figure 7: timestamp-associated, Umeyama-aligned 5th-floor trajectory
comparison against the LeGO-LOAM pseudo-ground-truth
(reference scripts/evaluation/figure7_clean.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from mlis_tpu.core.dataset import NUFRM3F, TRANSIT_FLOORS
from mlis_tpu.core.trajectory import combine_sequences
from mlis_tpu.eval.alignment import align_se3, align_sim3
from mlis_tpu.eval.association import associate_by_time
from mlis_tpu.ops.pairwise import candidate_pairs_host
from mlis_tpu.viz.figures import plot_multifloor_3d, plot_trajectory_comparison


def generate_figure6(
    trajectory_root: str,
    output_path: str,
    algorithm: str = "orb_slam3",
    max_edges: int = 100,
    sample_poses: int = 4000,
) -> Path:
    """3D multi-floor trajectory with gated loop-closure edges."""
    manifest = NUFRM3F(trajectory_root, algorithm)
    combined, floors = combine_sequences(manifest.load(), TRANSIT_FLOORS)

    # subsample for edge search (figure needs examples, not the full set)
    step = max(len(combined) // sample_poses, 1)
    sub = combined[::step]
    sub_floors = floors[::step]
    qi, mi, _ = candidate_pairs_host(
        sub[:, 1:4], sub_floors, radius=2.0, min_gap=max(100 // step, 2)
    )
    if len(qi) > max_edges:
        sel = np.linspace(0, len(qi) - 1, max_edges).astype(int)
        qi, mi = qi[sel], mi[sel]

    return plot_multifloor_3d(
        sub,
        sub_floors,
        output_path,
        title=f"Figure 6 — {algorithm}",
        link_pairs=list(zip(qi, mi)),
    )


def generate_figure7(
    trajectory_root: str,
    output_path: str,
    floor: str = "5th_floor",
) -> Optional[Path]:
    """Aligned trajectory comparison on one floor vs LeGO-LOAM."""
    lego = NUFRM3F(trajectory_root, "lego_loam")
    ref = {name: t for name, _, t in lego.load()}
    if floor not in ref:
        return None
    ref_traj = ref[floor]

    curves: Dict[str, np.ndarray] = {"LeGO-LOAM": ref_traj.positions[:, :2]}
    for algo, use_scale in (("orb_slam3", False), ("droid_slam", True)):
        manifest = NUFRM3F(trajectory_root, algo)
        found = {name: t for name, _, t in manifest.load()}
        if floor not in found:
            continue
        est = found[floor]
        ei, ri = associate_by_time(est.timestamps, ref_traj.timestamps, max_diff=0.1)
        if ei is None:
            continue
        src = est.positions[ei]
        tgt = ref_traj.positions[ri]
        if use_scale:
            _, s, R, t = align_sim3(src, tgt)
            aligned = s * est.positions @ R.T + t
        else:
            _, R, t = align_se3(src, tgt)
            aligned = est.positions @ R.T + t
        curves[algo] = aligned[:, :2]

    return plot_trajectory_comparison(
        curves, output_path, title=f"Figure 7 — {floor} comparison"
    )
