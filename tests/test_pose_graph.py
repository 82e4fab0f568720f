"""Pose-graph optimizer tests: Lie-map correctness (incl. the f32
cancellation and autodiff-at-identity regressions), GN convergence, and
the gate -> factors -> on-chip-solve -> ATE trajectory demo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlis_tpu.opt.lie import (
    se3_compose,
    se3_exp,
    se3_inv,
    se3_log,
    so3_exp,
    so3_log,
)
from mlis_tpu.opt.pose_graph import build_factors, optimize_pose_graph


def test_lie_roundtrips():
    rng = np.random.default_rng(0)
    xi = (rng.normal(size=(128, 6)) * 0.7).astype(np.float32)
    R, t = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(R, t))
    assert np.abs(back - xi).max() < 1e-5
    # rotations are orthonormal
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    assert np.abs(eye - np.eye(3)).max() < 1e-5

    w = (rng.normal(size=(64, 3)) * 0.9).astype(np.float32)
    back_w = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
    assert np.abs(back_w - w).max() < 1e-5


def test_lie_small_angle_f32_cancellation():
    """Regression: theta ~ 2e-4 rad used to hit the analytic branch where
    f32 rounds (1 - cos) to exactly 0, making V^-1 divide by zero. The
    Taylor cutoff must cover the whole f32 cancellation zone."""
    for theta in (1e-6, 1e-5, 2.3e-4, 1e-3, 9e-3):
        xi = jnp.asarray([0.1, -0.2, 0.05, theta, theta * 0.5, -theta])
        out = se3_log(*se3_exp(xi))
        assert bool(jnp.isfinite(out).all()), theta
        assert float(jnp.abs(out - xi).max()) < 5e-5, theta


def test_lie_jacobians_finite_at_identity():
    """Regression: vjp of arccos at cos=1 / division by raw theta_sq gave
    NaN jacobians at xi = 0 (every zero-residual factor)."""
    j1 = jax.jacrev(lambda xi: jnp.concatenate([a.ravel() for a in se3_exp(xi)]))(
        jnp.zeros(6)
    )
    j2 = jax.jacrev(lambda xi: se3_log(*se3_exp(xi)))(jnp.zeros(6))
    assert bool(jnp.isfinite(j1).all())
    assert bool(jnp.isfinite(j2).all())
    # d/dxi [log(exp(xi))] at 0 is the identity
    assert np.abs(np.asarray(j2) - np.eye(6)).max() < 1e-4


def _circle_graph(N=48, noise_seed=0, with_loop=True):
    rng = np.random.default_rng(noise_seed)
    theta = np.linspace(0, 2 * np.pi, N, endpoint=False)
    gt_t = np.stack(
        [np.cos(theta) * 5, np.sin(theta) * 5, np.zeros(N)], 1
    ).astype(np.float32)
    gt_R = np.stack(
        [
            np.asarray(so3_exp(jnp.asarray([0, 0, th + np.pi / 2], jnp.float32)))
            for th in theta
        ]
    )
    Rj, tj = jnp.asarray(gt_R), jnp.asarray(gt_t)
    edges, eR, et = [], [], []
    for i in range(N - 1):
        Ri_inv, ti_inv = se3_inv(Rj[i], tj[i])
        Rr, tr = se3_compose(Ri_inv, ti_inv, Rj[i + 1], tj[i + 1])
        n = rng.normal(size=6).astype(np.float32) * np.asarray(
            [0.02, 0.02, 0.005, 0.002, 0.002, 0.01], np.float32
        )
        dR, dt = se3_exp(jnp.asarray(n))
        Rr, tr = se3_compose(Rr, tr, dR, dt)
        edges.append((i, i + 1))
        eR.append(np.asarray(Rr))
        et.append(np.asarray(tr))
    init_R, init_t = [gt_R[0]], [gt_t[0]]
    for k in range(N - 1):
        Rn, tn = se3_compose(
            jnp.asarray(init_R[-1]), jnp.asarray(init_t[-1]),
            jnp.asarray(eR[k]), jnp.asarray(et[k]),
        )
        init_R.append(np.asarray(Rn))
        init_t.append(np.asarray(tn))
    if with_loop:
        Ri_inv, ti_inv = se3_inv(Rj[N - 1], tj[N - 1])
        Rr, tr = se3_compose(Ri_inv, ti_inv, Rj[0], tj[0])
        edges.append((N - 1, 0))
        eR.append(np.asarray(Rr))
        et.append(np.asarray(tr))
    return gt_R, gt_t, edges, np.stack(eR), np.stack(et), np.stack(init_R), np.stack(init_t)


@pytest.mark.smoke
def test_gauss_newton_reduces_ate_and_cost():
    gt_R, gt_t, edges, eR, et, R0, t0 = _circle_graph()
    f = build_factors(len(gt_t), edges, eR, et, sigma_rho=0.05, sigma_omega=0.02)
    R, t, costs, _ = optimize_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), f, num_iters=10, cg_iters=64
    )
    costs = np.asarray(costs)
    assert np.isfinite(costs).all()
    assert np.isfinite(np.asarray(t)).all()
    # cost decreases monotonically after the first step and collapses
    assert costs[-1] < 0.02 * costs[0]
    ate0 = float(np.sqrt((np.linalg.norm(t0 - gt_t, axis=1) ** 2).mean()))
    ate1 = float(np.sqrt((np.linalg.norm(np.asarray(t) - gt_t, axis=1) ** 2).mean()))
    assert ate1 < 0.5 * ate0, (ate0, ate1)
    # optimized rotations stay orthonormal (SVD re-projection)
    RR = np.asarray(R)
    eye = np.einsum("bij,bkj->bik", RR, RR)
    assert np.abs(eye - np.eye(3)).max() < 1e-4


@pytest.mark.smoke
def test_anchor_fixes_gauge():
    gt_R, gt_t, edges, eR, et, R0, t0 = _circle_graph(N=24)
    f = build_factors(len(gt_t), edges, eR, et)
    R, t, _, _ = optimize_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), f, num_iters=5, cg_iters=48
    )
    assert np.abs(np.asarray(t)[0] - t0[0]).max() < 1e-3
    assert np.abs(np.asarray(R)[0] - R0[0]).max() < 1e-3


def test_z_priors_pull_floor_height():
    """Floor z-priors (ContextualPriorFactor semantics) flatten z drift."""
    gt_R, gt_t, edges, eR, et, R0, t0 = _circle_graph(with_loop=False)
    # inject a z ramp into the init
    t0 = t0.copy()
    t0[:, 2] += np.linspace(0, 1.5, len(t0)).astype(np.float32)
    f = build_factors(
        len(gt_t), edges, eR, et,
        prior_z=np.zeros(len(gt_t), np.float32), sigma_z=0.2,
    )
    R, t, _, _ = optimize_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), f, num_iters=10, cg_iters=64
    )
    assert float(np.abs(np.asarray(t)[:, 2]).max()) < 0.35
    assert float(np.abs(t0[:, 2]).max()) > 1.3


def test_pgo_demo_gate_prevents_corruption():
    """The headline trajectory-level claim: semantic gating keeps the
    pose graph intact; ungated aliased cross-floor closures corrupt it."""
    from mlis_tpu.opt.demo import run_pgo_demo

    out = run_pgo_demo(seed=0)
    assert out["gate_correct"], out
    assert out["gated_ate_rmse"] < 0.6 * out["odometry_ate_rmse"], out
    assert out["ungated_ate_rmse"] > 2.0 * out["odometry_ate_rmse"], out
    assert out["ungated_ate_rmse"] > 5.0 * out["gated_ate_rmse"], out


def test_huber_tempers_false_closures():
    """With a robust kernel the ungated corruption shrinks but does not
    vanish — the gate (which removes the outliers outright) stays ahead.
    This is the quantitative answer to 'why not just use Huber?'."""
    from mlis_tpu.opt.demo import run_pgo_demo

    plain = run_pgo_demo(seed=0)
    robust = run_pgo_demo(seed=0, huber_delta=2.0)
    assert robust["ungated_ate_rmse"] < plain["ungated_ate_rmse"], (
        plain["ungated_ate_rmse"], robust["ungated_ate_rmse"],
    )
    assert robust["gated_ate_rmse"] < robust["ungated_ate_rmse"]


def test_switchable_constraints_disable_false_closures():
    """Switchable Constraints (the robust-back-end baseline) at the tuned
    prior weight disables exactly the aliased cross-floor closures and
    matches the gated solve — while needing a per-scene-sensitive weight
    and paying full verification + extra unknowns for every candidate
    the gate would have dropped at label-lookup cost."""
    from mlis_tpu.opt.demo import run_pgo_demo

    out = run_pgo_demo(seed=0)
    assert out["sc_false_disabled"] == 1.0, out
    assert out["sc_true_kept"] >= 0.9, out
    assert out["sc_ate_rmse"] < 1.5 * out["gated_ate_rmse"], out
    # and far below the non-robust ungated solve
    assert out["sc_ate_rmse"] < 0.25 * out["ungated_ate_rmse"], out


@pytest.mark.slow
def test_pgo_real_lego_loam_scale():
    """Real-data scale: the published LeGO-LOAM trajectory (2,406 poses)
    with its exact candidate set (87,044 / 21,477 same-floor / 65,567
    cross-floor re-derived in-run). Gating converts the reference's
    headline rejection statistic into trajectory error."""
    import os

    from mlis_tpu.opt.scale import run_pgo_real

    if not os.path.isdir("/root/reference/results/trajectories"):
        pytest.skip("reference trajectories not present")
    out = run_pgo_real(closure_stride=16, num_iters=12, cg_iters=1024)
    assert (out["candidates"], out["same_floor"], out["cross_floor"]) == (
        87044, 21477, 65567,
    )
    assert out["gated_ate_rmse"] < 0.2 * out["odometry_ate_rmse"], out
    assert out["ungated_ate_rmse"] > 2.0 * out["odometry_ate_rmse"], out


def test_gnc_tls_unit_rejects_outlier_edge():
    """GNC-TLS on a circle graph with one grossly wrong loop edge: the
    outlier's weight anneals to ~0 (binary in TLS), the good loop edge
    stays at 1, and the solve matches the clean-graph quality."""
    from mlis_tpu.opt.pose_graph import optimize_pose_graph_gnc

    gt_R, gt_t, edges, eR, et, R0, t0 = _circle_graph()
    # a FALSE loop closure: claims pose N/2 coincides with pose 0
    N = len(gt_t)
    edges = edges + [(N // 2, 0)]
    eR = np.concatenate([eR, np.eye(3, dtype=np.float32)[None]], 0)
    et = np.concatenate([et, np.zeros((1, 3), np.float32)], 0)
    # GNC edges: the two loop closures (true N-1->0 and false N/2->0)
    switchable = np.zeros(len(edges), bool)
    switchable[N - 1] = True  # true loop edge (appended by _circle_graph)
    switchable[-1] = True  # false loop edge
    f = build_factors(
        N, edges, eR, et, sigma_rho=0.05, sigma_omega=0.02,
        switchable=switchable,
    )
    # barcsq must sit ABOVE the true edge's whitened r2 at the estimate
    # reachable without it (~214 here, drifted odometry) and below the
    # outlier's (~1e5): TLS hard-cuts and cannot re-open an edge whose
    # residual never falls under the threshold (GM's soft weights avoid
    # this trap — one reason the reference's Kimera config picks GM)
    R, t, costs, w = optimize_pose_graph_gnc(
        jnp.asarray(R0), jnp.asarray(t0), f,
        cost_type="tls", barcsq=500.0, outer_iters=30, inner_iters=2,
        cg_iters=64,
    )
    w = np.asarray(w)
    assert w[len(edges) - 1] < 0.01, w[len(edges) - 1]  # false -> off
    assert w[N - 1] > 0.99, w[N - 1]  # true -> kept (TLS is binary)
    assert (w[len(edges):] == 1.0).all()  # padding edges untouched
    ate = float(np.sqrt(
        (np.linalg.norm(np.asarray(t) - gt_t, axis=1) ** 2).mean()
    ))
    ate0 = float(np.sqrt((np.linalg.norm(t0 - gt_t, axis=1) ** 2).mean()))
    assert ate < 0.5 * ate0


def test_gnc_matches_gated_solve_on_demo():
    """GNC (the reference's Kimera-RPGO outlier method: GM cost,
    config/kimera/ISEC_params.yaml outlier_method 2) anneals every
    aliased cross-floor closure to weight < 0.5 and recovers the gated
    trajectory — while, like SC, paying full verification + the robust
    machinery for every candidate the gate drops at label-lookup cost."""
    from mlis_tpu.opt.demo import run_pgo_demo

    out = run_pgo_demo(seed=0)
    assert out["gnc_false_disabled"] == 1.0, out
    assert out["gnc_true_kept"] >= 0.9, out
    assert out["gnc_ate_rmse"] < 1.5 * out["gated_ate_rmse"], out
    assert out["gnc_ate_rmse"] < 0.25 * out["ungated_ate_rmse"], out
