"""Figure generators (host-side matplotlib; Agg backend).

Covers the reference's visualization surface (SURVEY §2.8): floor-colored
top-down views + floor-over-time (floor segmentation), before/after gating
link diagrams, stacked-3D multi-floor views, trajectory comparison /
error figures, and the paper Figure 6/7 reproductions.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Patch  # noqa: E402


def _floor_colors(floors: np.ndarray) -> Dict[int, tuple]:
    uniq = np.unique(floors)
    cmap = plt.cm.Set1(np.linspace(0, 1, max(len(uniq), 2)))
    return dict(zip(uniq.tolist(), cmap))


def plot_floor_segmentation(
    tum_matrix: np.ndarray,
    floor_labels: np.ndarray,
    path: str | Path,
    title: str = "",
) -> Path:
    """Top-down trajectory colored by floor + floor-over-time step plot."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 6))
    colors = _floor_colors(floor_labels)

    for f, c in colors.items():
        m = floor_labels == f
        ax1.scatter(
            tum_matrix[m, 1], tum_matrix[m, 3], s=2, alpha=0.6,
            color=c, label=f"Floor {f}",
        )
    ax1.set_xlabel("X (m)")
    ax1.set_ylabel("Z (m)")
    ax1.set_title(f"{title} trajectory (top-down)".strip())
    ax1.legend(loc="best", markerscale=4)
    ax1.set_aspect("equal")
    ax1.grid(alpha=0.3)

    t = tum_matrix[:, 0] - tum_matrix[0, 0]
    ax2.step(t, floor_labels, where="post", linewidth=1.5)
    ax2.set_xlabel("Time (s)")
    ax2.set_ylabel("Floor")
    ax2.set_yticks(sorted(colors))
    ax2.set_title("Floor label over time")
    ax2.grid(alpha=0.3)

    fig.tight_layout()
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_loop_closure_gating(
    tum_matrix: np.ndarray,
    floor_labels: np.ndarray,
    candidate_pairs: Sequence[Tuple[int, int]],
    path: str | Path,
    title: str = "",
    max_links: int = 200,
) -> Path:
    """Before/after gating link diagram: green same-floor, red cross-floor."""
    pos = tum_matrix[:, 1:4]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 6))
    for ax in (ax1, ax2):
        ax.scatter(pos[:, 0], pos[:, 2], c="lightgray", s=1, alpha=0.5)
        ax.set_xlabel("X (m)")
        ax.set_ylabel("Z (m)")
        ax.set_aspect("equal")
        ax.grid(alpha=0.3)

    shown = list(candidate_pairs)[:max_links]
    n_valid = 0
    for q, m in shown:
        same = floor_labels[q] == floor_labels[m]
        xs = [pos[q, 0], pos[m, 0]]
        zs = [pos[q, 2], pos[m, 2]]
        if same:
            ax1.plot(xs, zs, "g-", alpha=0.3, linewidth=0.5)
            ax2.plot(xs, zs, "g-", alpha=0.4, linewidth=0.5)
            n_valid += 1
        else:
            ax1.plot(xs, zs, "r-", alpha=0.5, linewidth=1.0)

    ax1.legend(
        handles=[
            Patch(facecolor="green", alpha=0.5, label="Same-floor (valid)"),
            Patch(facecolor="red", alpha=0.5, label="Cross-floor (rejected)"),
        ],
        loc="best",
    )
    ax1.set_title(f"{title} before gating ({len(shown)} shown)".strip())
    ax2.set_title(f"After floor gating ({n_valid} valid shown)")
    fig.tight_layout()
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_multifloor_3d(
    tum_matrix: np.ndarray,
    floor_labels: np.ndarray,
    path: str | Path,
    title: str = "",
    floor_height: float = 5.0,
    link_pairs: Optional[Sequence[Tuple[int, int]]] = None,
) -> Path:
    """3D view with floors separated by height; optional loop-closure edges
    (the paper Figure-6 style perceptual-aliasing view)."""
    fig = plt.figure(figsize=(12, 10))
    ax = fig.add_subplot(111, projection="3d")
    colors = _floor_colors(floor_labels)
    min_floor = min(colors)

    z_of = (floor_labels - min_floor) * floor_height
    for f, c in colors.items():
        m = floor_labels == f
        ax.plot(
            tum_matrix[m, 1], tum_matrix[m, 3], z_of[m],
            color=c, linewidth=1.2, label=f"Floor {f}",
        )
    if link_pairs is not None:
        for q, mI in list(link_pairs)[:100]:
            same = floor_labels[q] == floor_labels[mI]
            ax.plot(
                [tum_matrix[q, 1], tum_matrix[mI, 1]],
                [tum_matrix[q, 3], tum_matrix[mI, 3]],
                [z_of[q], z_of[mI]],
                color="green" if same else "red",
                alpha=0.4,
                linewidth=0.8,
            )
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_zlabel("Height (m)")
    ax.set_title(f"{title} multi-floor trajectory".strip())
    ax.legend(loc="upper left")
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_trajectory_comparison(
    trajectories: Dict[str, np.ndarray],  # name -> (N, 3) aligned positions
    path: str | Path,
    title: str = "Trajectory comparison",
) -> Path:
    """Figure-7 style overlaid top-down comparison of aligned trajectories."""
    fig, ax = plt.subplots(figsize=(10, 8))
    for name, pos in trajectories.items():
        ax.plot(pos[:, 0], pos[:, 1], linewidth=1.2, label=name, alpha=0.8)
    ax.set_xlabel("X (m)")
    ax.set_ylabel("Y (m)")
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal")
    ax.grid(alpha=0.3)
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_error_accumulation(
    errors_by_algo: Dict[str, np.ndarray],  # name -> per-pose ATE errors
    path: str | Path,
) -> Path:
    fig, ax = plt.subplots(figsize=(10, 6))
    for name, errors in errors_by_algo.items():
        ax.plot(np.asarray(errors), linewidth=1.0, label=name, alpha=0.8)
    ax.set_xlabel("Pose index")
    ax.set_ylabel("ATE (m)")
    ax.set_title("Error accumulation along trajectory")
    ax.legend()
    ax.grid(alpha=0.3)
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_segment_heatmap(
    segment_rmse: Dict[str, List[float]],  # algo -> per-segment RMSE
    path: str | Path,
) -> Path:
    algos = list(segment_rmse)
    data = np.asarray([segment_rmse[a] for a in algos])
    fig, ax = plt.subplots(figsize=(10, 0.6 * len(algos) + 2))
    im = ax.imshow(data, aspect="auto", cmap="viridis")
    ax.set_yticks(range(len(algos)), algos)
    ax.set_xlabel("Trajectory segment")
    ax.set_title("Segment-wise ATE RMSE (m)")
    fig.colorbar(im, ax=ax)
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_rejection_rates(
    rates: Dict[str, float],  # algo -> cross-floor rejection rate
    path: str | Path,
) -> Path:
    fig, ax = plt.subplots(figsize=(8, 5))
    names = list(rates)
    vals = [100 * rates[n] for n in names]
    ax.bar(names, vals, color="tab:red", alpha=0.8)
    for i, v in enumerate(vals):
        ax.text(i, v + 1, f"{v:.1f}%", ha="center")
    ax.set_ylabel("Cross-floor candidates rejected (%)")
    ax.set_title("Semantic gating rejection rates")
    ax.set_ylim(0, 100)
    ax.grid(axis="y", alpha=0.3)
    path = Path(path)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path
