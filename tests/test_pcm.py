"""PCM loop-closure filtering (opt/pcm.py) — the reference's Kimera-RPGO
outlier_method 1 (config/kimera/ISEC_params.yaml:236-240).

Includes the measured demonstration of the weakness the reference's own
config comment describes ("perceptual aliasing creates correlated
outliers"): aliased cross-floor closures are mutually consistent, so PCM
only wins while the true clique outnumbers them — the semantic gate has
no such failure mode.
"""

import numpy as np
import pytest

from mlis_tpu.opt.pcm import greedy_max_clique, pcm_filter


def _demo_inputs(seed=0):
    from mlis_tpu.opt.demo import (
        build_multifloor_scene,
        make_loop_candidates,
        simulate_odometry,
    )

    scene = build_multifloor_scene(laps=2, seed=seed)
    _, _, _, init_R, init_t = simulate_odometry(
        scene["gt_R"], scene["gt_t"], seed=seed
    )
    pairs, mR, mt, is_true = make_loop_candidates(scene, seed=seed)
    return init_R, init_t, pairs, mR, mt, is_true


def test_greedy_max_clique_basics():
    # two disjoint cliques of size 3 and 2 -> picks the 3-clique
    adj = np.zeros((5, 5), bool)
    for a, b in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        adj[a, b] = adj[b, a] = True
    keep = greedy_max_clique(adj)
    assert keep.sum() == 3 and keep[:3].all()
    # singleton graph
    assert greedy_max_clique(np.zeros((1, 1), bool)).sum() == 1


def test_pcm_keeps_true_clique_on_demo():
    init_R, init_t, pairs, mR, mt, is_true = _demo_inputs()
    keep, r2 = pcm_filter(init_R, init_t, pairs, mR, mt,
                          sigma_rho=0.5, sigma_omega=0.05)
    assert keep[is_true].all()
    assert not keep[~is_true].any()
    # the aliased closures are MUTUALLY consistent (correlated outliers,
    # the reference config's stated concern) yet inconsistent with every
    # true closure — PCM separates the cliques and keeps the larger
    f = np.where(~is_true)[0]
    t = np.where(is_true)[0]
    thr = 16.81
    ff = (r2[np.ix_(f, f)] < thr)
    np.fill_diagonal(ff, True)
    assert ff.all()
    assert (r2[np.ix_(f, t)] >= thr).all()


def test_pcm_defeated_by_majority_aliasing_gate_is_not():
    """When correlated aliased closures OUTNUMBER the surviving true
    ones, PCM keeps the wrong (bigger) clique — the semantic gate, which
    never votes, still rejects every cross-floor pair. This quantifies
    why the reference's config recommends GNC over PCM for multi-floor
    scenes and why the gate beats both at the front end."""
    from mlis_tpu.gating.gate import SemanticLoopClosureGate
    from mlis_tpu.opt.demo import build_multifloor_scene

    init_R, init_t, pairs, mR, mt, is_true = _demo_inputs()
    t_idx = np.where(is_true)[0][:3]  # keep only 3 true closures
    f_idx = np.where(~is_true)[0]  # all 5 correlated aliased ones
    sel = np.concatenate([t_idx, f_idx])
    keep, _ = pcm_filter(init_R, init_t, pairs[sel], mR[sel], mt[sel],
                         sigma_rho=0.5, sigma_omega=0.05)
    assert keep[3:].all() and not keep[:3].any()  # PCM picked the outliers

    scene = build_multifloor_scene(laps=2, seed=0)
    gate = SemanticLoopClosureGate(scene["floor_labels"], strict_mode=True)
    accept = gate.gate_batch(pairs[sel][:, 0], pairs[sel][:, 1])
    assert accept[:3].all() and not accept[3:].any()  # gate is immune


def test_pcm_demo_variant_matches_gated():
    from mlis_tpu.opt.demo import run_pgo_demo

    out = run_pgo_demo(seed=0)
    assert out["pcm_false_removed"] == 1.0, out
    assert out["pcm_true_kept"] == 1.0, out
    assert out["pcm_ate_rmse"] <= 1.1 * out["gated_ate_rmse"], out
