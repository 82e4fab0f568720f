"""Pairwise Consistency Maximization (PCM) loop-closure filtering.

The reference's Kimera-RPGO configuration offers three outlier methods
(config/kimera/ISEC_params.yaml:236-240): 0 = none, 1 = PCM
(pcm_threshold 0.1), 2 = GNC. GNC lives in opt/pose_graph.py
(optimize_pose_graph_gnc); this module is method 1 — PCM (Mangelson et
al., ICRA 2018): two loop closures a = (i_a, j_a, Z_a) and
b = (i_b, j_b, Z_b) are PAIRWISE CONSISTENT when the cycle

    C_ab = Z_a^-1 * odom(i_a -> i_b) * Z_b * odom(j_b -> j_a)

is close to identity under the measurement covariance; the accepted set
is (approximately) the maximum clique of the consistency graph. Unlike
the solver-side robustifiers (Huber / SC / GNC) this is a FRONT-END
filter like the semantic gate — but it needs O(A^2) SE(3) cycle checks
where the gate needs one floor-label lookup per candidate.

TPU design: the (A, A) cycle-residual matrix is one jitted batched
Lie-group sweep (vmap over closure pairs, se3 compose/log on stacked
(A, A, 3, 3) tensors — VPU work, no Python pair loop). The max-clique
search runs host-side on the small boolean matrix with the standard
greedy degree heuristic (exact max clique is NP-hard; PCM
implementations use heuristics too).
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.opt.lie import se3_compose, se3_inv, se3_log


@jax.jit
def pairwise_cycle_r2(
    pose_R: jnp.ndarray,  # (N, 3, 3) odometry-integrated rotations
    pose_t: jnp.ndarray,  # (N, 3)
    ci: jnp.ndarray,  # (A,) int32 closure endpoint i
    cj: jnp.ndarray,  # (A,) int32 closure endpoint j
    cR: jnp.ndarray,  # (A, 3, 3) measured Z = T_i^-1 T_j
    ct: jnp.ndarray,  # (A, 3)
    w: jnp.ndarray,  # (6,) sqrt-information for the cycle residual
) -> jnp.ndarray:
    """(A, A) whitened squared cycle residuals; diagonal is 0."""

    def odom_rel(a, b):
        Ra_inv, ta_inv = se3_inv(pose_R[a], pose_t[a])
        return se3_compose(Ra_inv, ta_inv, pose_R[b], pose_t[b])

    def one_pair(a, b):
        Za_inv_R, Za_inv_t = se3_inv(cR[a], ct[a])
        O1 = odom_rel(ci[a], ci[b])
        O2 = odom_rel(cj[b], cj[a])
        R1, t1 = se3_compose(Za_inv_R, Za_inv_t, *O1)
        R2, t2 = se3_compose(R1, t1, cR[b], ct[b])
        R3, t3 = se3_compose(R2, t2, *O2)
        r = se3_log(R3, t3) * w
        return jnp.sum(r * r)

    A = ci.shape[0]
    idx = jnp.arange(A)
    return jax.vmap(
        lambda a: jax.vmap(lambda b: one_pair(a, b))(idx)
    )(idx)


def greedy_max_clique(adj: np.ndarray) -> np.ndarray:
    """Greedy max-clique heuristic on a boolean adjacency matrix:
    repeatedly add the candidate with the most remaining-candidate
    neighbors. Returns a boolean membership mask."""
    A = adj.shape[0]
    adj = np.asarray(adj, bool).copy()
    np.fill_diagonal(adj, False)
    best = np.zeros(A, bool)
    # seed from each of the top-degree vertices (cheap restarts make the
    # heuristic robust to adversarial tie-breaks)
    order = np.argsort(-adj.sum(1))
    for seed in order[: min(8, A)]:
        clique = [seed]
        cand = np.where(adj[seed])[0]
        while len(cand):
            sub = adj[np.ix_(cand, cand)]
            pick = cand[np.argmax(sub.sum(1))]
            clique.append(pick)
            cand = cand[adj[pick, cand]]
        if len(clique) > best.sum():
            best = np.zeros(A, bool)
            best[clique] = True
    return best


def pcm_filter(
    pose_R: np.ndarray,  # (N, 3, 3) odometry-integrated poses
    pose_t: np.ndarray,
    closures: np.ndarray,  # (A, 2) int endpoints
    closure_R: np.ndarray,  # (A, 3, 3)
    closure_t: np.ndarray,  # (A, 3)
    sigma_rho: float = 0.2,  # cycle translation sigma (odometry drift
    # accumulates over the cycle, so this is LOOSER than a single edge's)
    sigma_omega: float = 0.05,
    threshold: float = 16.81,  # chi2(0.99, 6) on the whitened cycle
) -> Tuple[np.ndarray, np.ndarray]:
    """PCM: keep the (approximately) largest mutually consistent closure
    set. Returns (keep_mask (A,) bool, r2 (A, A) cycle residuals)."""
    A = len(closures)
    if A == 0:
        return np.zeros(0, bool), np.zeros((0, 0), np.float32)
    w = jnp.asarray(
        [1.0 / sigma_rho] * 3 + [1.0 / sigma_omega] * 3, jnp.float32
    )
    r2 = np.asarray(
        pairwise_cycle_r2(
            jnp.asarray(pose_R, jnp.float32),
            jnp.asarray(pose_t, jnp.float32),
            jnp.asarray(closures[:, 0], jnp.int32),
            jnp.asarray(closures[:, 1], jnp.int32),
            jnp.asarray(closure_R, jnp.float32),
            jnp.asarray(closure_t, jnp.float32),
            w,
        )
    )
    adj = (r2 < threshold) & (r2.T < threshold)
    keep = greedy_max_clique(adj)
    return keep, r2
