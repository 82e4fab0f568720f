"""Trajectory-level demonstration of the semantic gate's value.

The reference's headline claim (README.md:154-158, the paper's Sec. V)
is that cross-floor loop closures CORRUPT the pose graph in multi-level
buildings, and semantic gating prevents it — but the reference never
closes that loop itself: it emits gate decisions and GTSAM factor specs
(loop_closure_gate.py:151-213) and leaves optimization to the upstream
SLAM systems. This module closes it on TPU:

  multi-floor GT trajectory with drift
    -> loop-closure candidates (true revisits + cross-floor aliases)
    -> SemanticLoopClosureGate.gate_batch          (the actual gate)
    -> ContextualPriorFactor.floor_priors + elevator dz factors
    -> opt/pose_graph.optimize_pose_graph          (on-chip GN solve)
    -> ATE vs ground truth (eval/metrics.compute_ate)

Three optimizations on the SAME odometry: closures gated (semantic gate
on), closures ungated (the aliased cross-floor pairs included — they
geometrically verify in the quality bench, eval/quality.py, so including
them is exactly what a gate-less system would do), and odometry-only.
The demo's contract: ate(gated) < ate(odometry-only) << ate(ungated).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from mlis_tpu.gating.gate import ContextualPriorFactor, SemanticLoopClosureGate
from mlis_tpu.opt.lie import se3_compose, se3_exp, se3_inv, so3_exp
from mlis_tpu.opt.pose_graph import build_factors, optimize_pose_graph


def _rect_path(cx: float, cy: float, w: float, h: float, step: float):
    """Rectangle perimeter waypoints (x, y, yaw), counter-clockwise."""
    pts = []
    corners = [
        (cx - w / 2, cy - h / 2),
        (cx + w / 2, cy - h / 2),
        (cx + w / 2, cy + h / 2),
        (cx - w / 2, cy + h / 2),
    ]
    for s in range(4):
        x0, y0 = corners[s]
        x1, y1 = corners[(s + 1) % 4]
        seg = np.hypot(x1 - x0, y1 - y0)
        n = max(int(seg / step), 1)
        yaw = np.arctan2(y1 - y0, x1 - x0)
        for k in range(n):
            a = k / n
            pts.append((x0 + a * (x1 - x0), y0 + a * (y1 - y0), yaw))
    return pts


def build_multifloor_scene(
    floors: Tuple[int, int] = (2, 5),
    laps: int = 2,
    floor_height: float = 3.0,
    step: float = 0.6,
    seed: int = 0,
):
    """GT trajectory: `laps` rectangle laps on the lower floor, an elevator
    ascent, `laps` laps of the SAME rectangle footprint on the upper floor
    (the aliasing geometry: identical (x, y) paths stacked vertically,
    NUFR-M3F's ISEC staircase/elevator core).

    Returns dict with gt_R (N,3,3), gt_t (N,3), floor_labels (N,),
    lap_starts (per floor, list of pose index where each lap begins),
    elevator (pose_before, pose_after).
    """
    lo, hi = floors
    path = _rect_path(0.0, 0.0, 10.0, 6.0, step)
    L = len(path)
    ts, Rs, labels = [], [], []
    lap_starts: Dict[int, List[int]] = {lo: [], hi: []}

    def add_floor(floor: int):
        z = floor * floor_height
        for _ in range(laps):
            lap_starts[floor].append(len(ts))
            for x, y, yaw in path:
                ts.append((x, y, z))
                Rs.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32))))
                labels.append(floor)

    add_floor(lo)
    # elevator: vertical ascent at the rectangle's first corner
    pose_before = len(ts) - 1
    x0, y0, yaw0 = path[0]
    n_elev = 10
    for k in range(1, n_elev + 1):
        z = lo * floor_height + (hi - lo) * floor_height * k / n_elev
        ts.append((x0, y0, z))
        Rs.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.0, yaw0], jnp.float32))))
        labels.append(lo if k <= n_elev // 2 else hi)
    pose_after = len(ts) - 1
    add_floor(hi)

    return {
        "gt_R": np.stack(Rs).astype(np.float32),
        "gt_t": np.asarray(ts, np.float32),
        "floor_labels": np.asarray(labels, np.int32),
        "lap_starts": lap_starts,
        "lap_len": L,
        "floors": floors,
        "floor_height": floor_height,
        "elevator": (pose_before, pose_after),
    }


def simulate_odometry(
    gt_R: np.ndarray,
    gt_t: np.ndarray,
    seed: int = 0,
    sigma_rho: float = 0.02,
    sigma_omega: float = 0.003,
    yaw_bias: float = 0.0015,
):
    """Relative GT poses corrupted by white noise + a constant yaw-rate
    bias (the drift source); returns (edges, edge_R, edge_t, init_R,
    init_t) with the init integrated from the noisy odometry."""
    rng = np.random.default_rng(seed)
    N = gt_t.shape[0]
    Rj, tj = jnp.asarray(gt_R), jnp.asarray(gt_t)
    Ri_inv, ti_inv = se3_inv(Rj[:-1], tj[:-1])
    Rrel, trel = se3_compose(Ri_inv, ti_inv, Rj[1:], tj[1:])
    noise = rng.normal(size=(N - 1, 6)).astype(np.float32) * np.asarray(
        [sigma_rho, sigma_rho, sigma_rho * 0.25,
         sigma_omega * 0.3, sigma_omega * 0.3, sigma_omega],
        np.float32,
    )
    noise[:, 5] += yaw_bias
    dR, dt = se3_exp(jnp.asarray(noise))
    eR, et = se3_compose(Rrel, trel, dR, dt)
    eR, et = np.asarray(eR), np.asarray(et)

    init_R = [gt_R[0]]
    init_t = [gt_t[0]]
    for k in range(N - 1):
        Rn, tn = se3_compose(
            jnp.asarray(init_R[-1]), jnp.asarray(init_t[-1]),
            jnp.asarray(eR[k]), jnp.asarray(et[k]),
        )
        init_R.append(np.asarray(Rn))
        init_t.append(np.asarray(tn))
    edges = [(i, i + 1) for i in range(N - 1)]
    return edges, eR, et, np.stack(init_R), np.stack(init_t)


def make_loop_candidates(scene: dict, every: int = 6, seed: int = 0):
    """Loop-closure candidates with measured relative poses.

    TRUE candidates: lap-2 pose <-> the same lap-1 pose on the same floor
    (measurement = GT relative pose + small noise, i.e. what a correct
    match + RANSAC pose would estimate).
    FALSE candidates: upper-floor pose <-> the vertically-aligned
    lower-floor pose (measurement CLAIMS the identity relative pose — the
    aliased features match as if the places were the same; eval/quality.py
    measures that such pairs do RANSAC-verify on repeated structure).

    Returns (pairs (M,2), meas_R, meas_t, is_true (M,)).
    """
    rng = np.random.default_rng(seed + 1)
    gt_R, gt_t = scene["gt_R"], scene["gt_t"]
    Rj, tj = jnp.asarray(gt_R), jnp.asarray(gt_t)
    L = scene["lap_len"]
    lo, hi = scene["floors"]
    pairs, meas_R, meas_t, is_true = [], [], [], []

    def add(i, j, true_pair):
        if true_pair:
            Ri_inv, ti_inv = se3_inv(Rj[i], tj[i])
            Rr, tr = se3_compose(Ri_inv, ti_inv, Rj[j], tj[j])
            n = rng.normal(size=6).astype(np.float32) * np.asarray(
                [0.03, 0.03, 0.03, 0.005, 0.005, 0.005], np.float32
            )
            dR, dt = se3_exp(jnp.asarray(n))
            Rr, tr = se3_compose(Rr, tr, dR, dt)
        else:
            # aliased match: claims j sits where i is (identity + jitter)
            n = rng.normal(size=6).astype(np.float32) * np.asarray(
                [0.05, 0.05, 0.05, 0.01, 0.01, 0.01], np.float32
            )
            Rr, tr = se3_exp(jnp.asarray(n))
        pairs.append((i, j))
        meas_R.append(np.asarray(Rr))
        meas_t.append(np.asarray(tr))
        is_true.append(true_pair)

    for floor in (lo, hi):
        lap1, lap2 = scene["lap_starts"][floor][0], scene["lap_starts"][floor][1]
        for k in range(0, L, every):
            add(lap1 + k, lap2 + k, True)
    # cross-floor aliases: same in-lap offset, different floor
    lo1, hi1 = scene["lap_starts"][lo][0], scene["lap_starts"][hi][0]
    for k in range(0, L, every * 2):
        add(lo1 + k, hi1 + k, False)

    return (
        np.asarray(pairs, np.int64),
        np.stack(meas_R),
        np.stack(meas_t),
        np.asarray(is_true, bool),
    )


def run_pgo_demo(
    seed: int = 0,
    laps: int = 2,
    num_iters: int = 20,
    cg_iters: int = 256,
    huber_delta: float = None,
    use_priors: bool = True,
    return_trajectories: bool = False,
) -> Dict:
    """Full chain: scene -> candidates -> gate -> factors -> on-chip GN ->
    ATE. Returns a flat JSON-ready dict (plus a non-JSON "trajectories"
    entry for viz.figures.plot_pgo_comparison when requested)."""
    scene = build_multifloor_scene(laps=laps, seed=seed)
    gt_R, gt_t = scene["gt_R"], scene["gt_t"]
    labels = scene["floor_labels"]
    N = gt_t.shape[0]

    odo_edges, odo_R, odo_t, init_R, init_t = simulate_odometry(
        gt_R, gt_t, seed=seed
    )
    pairs, mR, mt, is_true = make_loop_candidates(scene, seed=seed)

    gate = SemanticLoopClosureGate(labels, strict_mode=True)
    accept = gate.gate_batch(pairs[:, 0], pairs[:, 1])

    prior = ContextualPriorFactor(labels)
    expected_z, _ = prior.floor_priors(scene["floor_height"], sigma_z=0.5)
    pb, pa = scene["elevator"]
    dz_edges = [
        (pb, pa, float((labels[pa] - labels[pb]) * scene["floor_height"]))
    ]

    loop_sigmas = np.tile(np.asarray([[0.05, 0.01]], np.float32), (len(pairs), 1))
    odo_sigmas = np.tile(np.asarray([[0.03, 0.004]], np.float32), (len(odo_edges), 1))

    def solve(closure_mask: np.ndarray, sc: bool = False, gnc: bool = False) -> Dict:
        keep = np.nonzero(closure_mask)[0]
        edges = odo_edges + [tuple(pairs[i]) for i in keep]
        eR = np.concatenate([odo_R, mR[keep]], axis=0)
        et = np.concatenate([odo_t, mt[keep]], axis=0)
        sig = np.concatenate([odo_sigmas, loop_sigmas[keep]], axis=0)
        switchable = (
            np.concatenate(
                [np.zeros(len(odo_edges), bool), np.ones(len(keep), bool)]
            )
            if (sc or gnc)  # GNC reuses the same loop-edge flag
            else None
        )
        factors = build_factors(
            N, edges, eR, et,
            edge_sigmas=sig,
            prior_z=expected_z if use_priors else None,
            sigma_z=0.5,
            dz_edges=dz_edges if use_priors else (),
            switchable=switchable,
        )
        if gnc:
            from mlis_tpu.opt.pose_graph import optimize_pose_graph_gnc

            R, t, costs, switches = optimize_pose_graph_gnc(
                jnp.asarray(init_R), jnp.asarray(init_t), factors,
                inner_iters=2, cg_iters=cg_iters,
            )
        else:
            R, t, costs, switches = optimize_pose_graph(
                jnp.asarray(init_R), jnp.asarray(init_t), factors,
                num_iters=num_iters, cg_iters=cg_iters, huber_delta=huber_delta,
            )
        from mlis_tpu.eval.metrics import compute_ate

        ate = compute_ate(np.asarray(t), gt_t)
        out = {
            "ate_rmse": float(ate["rmse"]),
            "ate_max": float(ate["max"]),
            "cost_final": float(np.asarray(costs)[-1]),
            "_t": np.asarray(t),
        }
        if sc or gnc:
            # per-closure switch/GNC-weight values, aligned with `keep`
            sw = np.asarray(switches)[len(odo_edges) : len(odo_edges) + len(keep)]
            truth = is_true[keep]
            out["false_disabled"] = float((sw[~truth] < 0.5).mean()) if (~truth).any() else 1.0
            out["true_kept"] = float((sw[truth] >= 0.5).mean()) if truth.any() else 1.0
        return out

    from mlis_tpu.eval.metrics import compute_ate

    out = {
        "n_poses": int(N),
        "n_candidates": int(len(pairs)),
        "n_true": int(is_true.sum()),
        "n_false": int((~is_true).sum()),
        "gate_accepted": int(accept.sum()),
        "gate_rejected": int((~accept).sum()),
        # the gate must keep exactly the true pairs on this scene
        "gate_correct": bool((accept == is_true).all()),
        "ate_init": float(compute_ate(init_t, gt_t)["rmse"]),
    }
    res_odo = solve(np.zeros(len(pairs), bool))
    res_gated = solve(accept)
    res_ungated = solve(np.ones(len(pairs), bool))
    # Switchable Constraints on ALL candidates: the classic robust-back-end
    # alternative to gating (per-closure switch variables the optimizer can
    # turn off) — the quantitative baseline for "why gate at the front end"
    res_sc = solve(np.ones(len(pairs), bool), sc=True)
    # GNC on ALL candidates: the reference's own robust back-end choice
    # (Kimera-RPGO, config/kimera/ISEC_params.yaml outlier_method 2)
    res_gnc = solve(np.ones(len(pairs), bool), gnc=True)
    # PCM (outlier_method 1): front-end pairwise-consistency filter on
    # the odometry-integrated poses, then a plain (non-robust) solve on
    # the surviving clique — O(A^2) SE(3) cycle checks where the gate
    # pays one label lookup per candidate
    from mlis_tpu.opt.pcm import pcm_filter

    pcm_keep, _ = pcm_filter(
        init_R, init_t, pairs, mR, mt,
        # cycle covariance = odometry drift accumulated over the loop,
        # much looser than a single edge's sigma
        sigma_rho=0.5, sigma_omega=0.05,
    )
    res_pcm = solve(pcm_keep)
    res_pcm["false_removed"] = (
        float((~pcm_keep[~is_true]).mean()) if (~is_true).any() else 1.0
    )
    res_pcm["true_kept"] = (
        float(pcm_keep[is_true].mean()) if is_true.any() else 1.0
    )
    trajs = {
        "odometry": res_odo.pop("_t"),
        "gated": res_gated.pop("_t"),
        "ungated": res_ungated.pop("_t"),
        "ungated_sc": res_sc.pop("_t"),
        "ungated_gnc": res_gnc.pop("_t"),
        "ungated_pcm": res_pcm.pop("_t"),
    }
    out.update({f"odometry_{k}": v for k, v in res_odo.items()})
    out.update({f"gated_{k}": v for k, v in res_gated.items()})
    out.update({f"ungated_{k}": v for k, v in res_ungated.items()})
    out.update({f"sc_{k}": v for k, v in res_sc.items()})
    out.update({f"gnc_{k}": v for k, v in res_gnc.items()})
    out.update({f"pcm_{k}": v for k, v in res_pcm.items()})
    if return_trajectories:
        out["trajectories"] = trajs
        out["gt_t"] = gt_t
        out["floor_labels"] = labels
    return out
