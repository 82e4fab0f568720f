"""Batched epipolar geometry: essential-matrix RANSAC + pose recovery.

Replaces the reference's per-pair cv2.findEssentialMat / cv2.recoverPose
calls (geometric_verification.py:104-188) with fixed-hypothesis-count,
static-shape kernels that `vmap` over candidate pairs:

  * hypotheses: 8-point algorithm on random minimal samples — a batched
    (H, 8, 9) SVD, followed by projection onto the essential manifold
    (singular values -> (1, 1, 0));
  * inlier scoring: Sampson distance in normalized coordinates, threshold
    = pixel_threshold / focal (the cv2 convention), one (H, N) reduction;
  * pose recovery: the four (R, t) decompositions of the best E, cheirality
    (positive-depth) voting via closed-form two-view triangulation.

Decision-level parity with the reference: validity is judged on inlier
counts/ratios (>= 20 inliers, ratio >= 0.25), not on bitwise-equal masks —
OpenCV's RANSAC is itself nondeterministic across runs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EssentialResult(NamedTuple):
    E: jnp.ndarray  # (3, 3)
    inlier_mask: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    inlier_ratio: jnp.ndarray  # () float32


def to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_points(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera coordinates: (x - c) / f."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack(
        [(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1
    )


def _project_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold (singular values -> 1, 1, 0)."""
    u, s, vt = jnp.linalg.svd(E)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ vt


def _gauss_jordan_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b for SPD M (n, n) with an unrolled-free Gauss-Jordan
    fori_loop — pure elementwise/outer-product ops, no lax.linalg (batched
    small SVD/LU on TPU costs ~1 s for the RANSAC hypothesis counts here)."""
    n = M.shape[0]

    def body(k, carry):
        M, b = carry
        piv = M[k, k]
        piv = jnp.where(jnp.abs(piv) < 1e-12, 1e-12, piv)
        rowk = M[k] / piv
        bk = b[k] / piv
        M = M.at[k].set(rowk)
        b = b.at[k].set(bk)
        col = M[:, k].at[k].set(0.0)
        M = M - col[:, None] * rowk[None, :]
        b = b - col * bk
        return M, b

    _, x = jax.lax.fori_loop(0, n, body, (M, b))
    return x


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Essential matrix from >= 8 normalized correspondences (UNPROJECTED,
    gauge-fixed E_33 = 1).

    Instead of the null-space SVD (prohibitively slow batched on TPU), the
    scale gauge is fixed by E_33 = 1 and the remaining 8 coefficients solve
    the SPD normal equations A8^T A8 e = -A8^T a9 via Gauss-Jordan. The
    Sampson error is scale-invariant, so hypothesis RANKING is unaffected;
    degenerate samples (true E_33 ~ 0) produce poor hypotheses that RANSAC
    discards, and the winning E gets an exact SVD essential projection in
    essential_ransac.
    """
    h1 = to_homogeneous(x1)  # (M, 3)
    h2 = to_homogeneous(x2)
    # constraint rows: kron(h2_i, h1_i)
    A = (h2[:, :, None] * h1[:, None, :]).reshape(x1.shape[0], 9)
    A8 = A[:, :8]
    a9 = A[:, 8]
    M = A8.T @ A8 + 1e-10 * jnp.eye(8, dtype=A.dtype)
    rhs = -(A8.T @ a9)
    e8 = _gauss_jordan_solve(M, rhs)
    e = jnp.concatenate([e8, jnp.ones(1, A.dtype)])
    return e.reshape(3, 3)


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric error in normalized coords, (N,)."""
    h1 = to_homogeneous(x1)  # (N, 3)
    h2 = to_homogeneous(x2)
    Ex1 = h1 @ E.T  # (N, 3)  == (E @ h1^T)^T
    Etx2 = h2 @ E  # (N, 3)
    err = jnp.sum(h2 * Ex1, axis=-1)
    denom = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return err**2 / jnp.maximum(denom, 1e-12)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "score_subset")
)
def essential_ransac(
    kpts1: jnp.ndarray,  # (N, 2) pixel coords
    kpts2: jnp.ndarray,  # (N, 2)
    valid: jnp.ndarray,  # (N,) bool — mask for padded correspondences
    K: jnp.ndarray,  # (3, 3)
    key: jax.Array,
    num_hypotheses: int = 512,
    threshold_px: float = 3.0,
    score_subset: int = 0,
) -> EssentialResult:
    """Fixed-budget RANSAC for one pair (vmap over pairs for batches).

    score_subset > 0 enables two-stage hypothesis scoring (the classic
    preemptive-RANSAC trick, and the TPU analogue of OpenCV's early-exit
    inner loop): all H hypotheses are ranked on a stratified subset of
    `score_subset` valid correspondences — an (H, S) problem instead of
    (H, N) — and only the TOP_K finalists are essential-projected and
    rescored on ALL N points. The returned inlier mask/count/ratio are
    always computed on the full N with the projected E, so only finalist
    SELECTION is approximate. 0 = score every hypothesis on all N.
    """
    N = kpts1.shape[0]
    x1 = normalize_points(kpts1.astype(jnp.float32), K)
    x2 = normalize_points(kpts2.astype(jnp.float32), K)
    n_valid = jnp.sum(valid)

    # sample 8 valid indices per hypothesis: draw uniform over [0, n_valid)
    # through a compaction permutation (valid indices first)
    order = jnp.argsort(~valid, stable=True)
    u = jax.random.uniform(key, (num_hypotheses, 8))
    draw = (u * jnp.maximum(n_valid, 1)).astype(jnp.int32)
    draw = jnp.minimum(draw, jnp.maximum(n_valid - 1, 0))
    idx = order[draw]  # (H, 8)

    Es = jax.vmap(lambda i: _eight_point(x1[i], x2[i]))(idx)  # (H, 3, 3)

    f_mean = 0.5 * (K[0, 0] + K[1, 1])
    thr = (threshold_px / f_mean) ** 2

    if 0 < score_subset < N:
        # stage A: stratified subset of the valid-first permutation —
        # positions j*n_valid/S for j in [0, S) all land in [0, n_valid)
        S = int(score_subset)
        pos = (jnp.arange(S) * jnp.maximum(n_valid, 1)) // S
        sub = order[jnp.minimum(pos, N - 1)]  # (S,) indices into 0..N-1
        x1s, x2s, vs = x1[sub], x2[sub], valid[sub]
        errs = jax.vmap(lambda E: sampson_error(E, x1s, x2s))(Es)  # (H, S)
        counts = jnp.sum((errs < thr) & vs[None, :], axis=1)
    else:
        errs = jax.vmap(lambda E: sampson_error(E, x1, x2))(Es)  # (H, N)
        counts = jnp.sum((errs < thr) & valid[None, :], axis=1)

    # The gauge-fixed fit is a general fundamental-style solution; a
    # hypothesis can score well unprojected yet sit far from the essential
    # manifold. Project + rescore the TOP_K unprojected candidates (a
    # handful of exact 3x3 SVDs) and keep the best projected one.
    TOP_K = 8
    _, cand = jax.lax.top_k(counts, TOP_K)
    E_cand = jax.vmap(_project_essential)(Es[cand])  # (TOP_K, 3, 3)
    errs_c = jax.vmap(lambda E: sampson_error(E, x1, x2))(E_cand)
    inl_c = (errs_c < thr) & valid[None, :]
    counts_c = jnp.sum(inl_c, axis=1)
    best = jnp.argmax(counts_c)

    E = E_cand[best]
    mask = inl_c[best]
    num = counts_c[best]
    ratio = num / jnp.maximum(n_valid, 1)
    return EssentialResult(E, mask, num.astype(jnp.int32), ratio.astype(jnp.float32))


def _triangulate_depths(
    R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form two-view depths for x2 ~ R x1 + t. Returns (z1, z2)."""
    h1 = to_homogeneous(x1)  # (N, 3)
    h2 = to_homogeneous(x2)
    Rx1 = h1 @ R.T  # (N, 3)
    c = jnp.cross(h2, Rx1)  # (N, 3)
    ct = jnp.cross(h2, jnp.broadcast_to(t, h2.shape))
    z1 = -jnp.sum(ct * c, axis=-1) / jnp.maximum(
        jnp.sum(c * c, axis=-1), 1e-12
    )
    z2 = Rx1[:, 2] * z1 + t[2]
    return z1, z2


@jax.jit
def recover_pose(
    E: jnp.ndarray,  # (3, 3)
    kpts1: jnp.ndarray,  # (N, 2) pixels
    kpts2: jnp.ndarray,
    inlier_mask: jnp.ndarray,  # (N,) bool
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cheirality-voted (R, t) from E (cv2.recoverPose semantics: x2 = R x1 + t,
    |t| = 1). Returns (T (4,4), num_good (int32), R_det (float32))."""
    x1 = normalize_points(kpts1.astype(jnp.float32), K)
    x2 = normalize_points(kpts2.astype(jnp.float32), K)

    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    tvec = u[:, 2]

    def score(R, t):
        z1, z2 = _triangulate_depths(R, t, x1, x2)
        good = (z1 > 0) & (z2 > 0) & inlier_mask
        return jnp.sum(good)

    cands = [(R1, tvec), (R1, -tvec), (R2, tvec), (R2, -tvec)]
    scores = jnp.stack([score(R, t) for R, t in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]

    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T, scores[best].astype(jnp.int32), jnp.linalg.det(R)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "score_subset")
)
def essential_ransac_batch(
    kpts1: jnp.ndarray,  # (P, N, 2)
    kpts2: jnp.ndarray,
    valid: jnp.ndarray,  # (P, N)
    K: jnp.ndarray,  # (3, 3) shared intrinsics
    key: jax.Array,
    num_hypotheses: int = 512,
    threshold_px: float = 3.0,
    score_subset: int = 0,
):
    """RANSAC + pose recovery for a whole batch of candidate pairs."""
    P = kpts1.shape[0]
    keys = jax.random.split(key, P)

    def one(k1, k2, v, kk):
        res = essential_ransac(
            k1, k2, v, K, kk, num_hypotheses, threshold_px, score_subset
        )
        T, good, det = recover_pose(res.E, k1, k2, res.inlier_mask, K)
        return res, T, good

    return jax.vmap(one)(kpts1, kpts2, valid, keys)
