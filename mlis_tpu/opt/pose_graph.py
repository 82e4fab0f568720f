"""TPU-native SE(3) pose-graph optimizer (Gauss-Newton + matrix-free CG).

Consumes the semantic gate's own factor emitters end-to-end: between
factors for odometry and (gated) loop closures, the per-pose z priors
from `gating.gate.ContextualPriorFactor.floor_priors`, and elevator
dz transition factors (reference loop_closure_gate.py:151-213 emits
these for GTSAM; the reference never ships an optimizer — the upstream
SLAM systems own it. Here the whole solve runs on-chip).

Design (TPU-first, no GTSAM translation):
- All factor sets are PADDED, MASKED, static-shape arrays (a pytree
  NamedTuple) — one compiled program serves any graph up to the pad.
- The normal equations (J^T J + lam I) p = -J^T r are solved MATRIX-FREE:
  J v via `jax.jvp`, J^T u via `jax.vjp`, conjugate gradient as a fixed-
  length `lax.scan`. No Jacobian is ever materialized; each CG step is
  two sweeps over the factor graph (batched 3x3/4x4 einsums — MXU work).
- Gauss-Newton outer loop is another `lax.scan`; the retraction is the
  right perturbation T <- T @ Exp(xi) (opt/lie.py).
- Gauge freedom is removed by a strong 6-dof anchor factor on pose 0.

Cost scaling: one CG step is O(E) fused small einsums; the demo-scale
graphs (N ~ 1e3, E ~ N) solve in milliseconds once compiled.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.opt.lie import (
    se3_compose,
    se3_inv,
    se3_log,
    se3_retract,
)


class PoseGraphFactors(NamedTuple):
    """Padded, masked factor arrays (a JAX pytree).

    Between factors measure Z = T_i^-1 T_j; residual = Log(Z^-1 T_i^-1 T_j)
    weighted per-component by `edge_w` ([rho x3, omega x3] sqrt-information).
    Z priors pull pose z toward the floor-height expectation; dz factors
    constrain elevator transitions (z_j - z_i = expected dz).
    """

    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_R: jnp.ndarray  # (E, 3, 3) measured relative rotation
    edge_t: jnp.ndarray  # (E, 3) measured relative translation
    edge_w: jnp.ndarray  # (E, 6) sqrt-information per tangent component
    edge_mask: jnp.ndarray  # (E,) 1.0 = live factor, 0.0 = padding
    edge_switch: jnp.ndarray  # (E,) 1.0 = switchable loop edge (SC mode)
    prior_z: jnp.ndarray  # (N,) expected z per pose
    prior_w: jnp.ndarray  # (N,) 1/sigma_z
    prior_mask: jnp.ndarray  # (N,)
    dz_i: jnp.ndarray  # (D,) int32
    dz_j: jnp.ndarray  # (D,) int32
    dz: jnp.ndarray  # (D,) expected z_j - z_i
    dz_w: jnp.ndarray  # (D,) 1/sigma_dz
    dz_mask: jnp.ndarray  # (D,)


def _empty_like(n: int) -> Dict[str, np.ndarray]:
    return {
        "prior_z": np.zeros(n, np.float32),
        "prior_w": np.zeros(n, np.float32),
        "prior_mask": np.zeros(n, np.float32),
        "dz_i": np.zeros(1, np.int32),
        "dz_j": np.zeros(1, np.int32),
        "dz": np.zeros(1, np.float32),
        "dz_w": np.zeros(1, np.float32),
        "dz_mask": np.zeros(1, np.float32),
    }


def build_factors(
    n_poses: int,
    edges: Sequence[Tuple[int, int]],
    edge_R: np.ndarray,
    edge_t: np.ndarray,
    sigma_rho: float = 0.05,
    sigma_omega: float = 0.01,
    edge_sigmas: Optional[np.ndarray] = None,  # (E, 2) per-edge overrides
    prior_z: Optional[np.ndarray] = None,
    sigma_z: float = 0.5,
    dz_edges: Sequence[Tuple[int, int, float]] = (),
    sigma_dz: float = 0.3,
    pad_edges: Optional[int] = None,
    switchable: Optional[np.ndarray] = None,  # (E,) bool: loop edges that
    # get a Switchable-Constraints variable (Suenderhauf & Protzel 2012)
) -> PoseGraphFactors:
    """Assemble a PoseGraphFactors pytree from host-side lists.

    `prior_z` is typically `ContextualPriorFactor.floor_priors()[0]`;
    `dz_edges` are (i, j, expected_dz) from elevator transition factors.
    `pad_edges` rounds the between-factor count up (power-of-two padding
    keeps recompiles rare as gated loop-closure sets change size).
    """
    e = len(edges)
    pad = pad_edges or max(1, 1 << (e - 1).bit_length() if e else 1)
    assert pad >= e, (pad, e)
    ei = np.zeros(pad, np.int32)
    ej = np.zeros(pad, np.int32)
    eR = np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))
    et = np.zeros((pad, 3), np.float32)
    ew = np.zeros((pad, 6), np.float32)
    em = np.zeros(pad, np.float32)
    esw = np.zeros(pad, np.float32)
    if e:
        ei[:e] = [i for i, _ in edges]
        ej[:e] = [j for _, j in edges]
        eR[:e] = np.asarray(edge_R, np.float32)
        et[:e] = np.asarray(edge_t, np.float32)
        if edge_sigmas is None:
            edge_sigmas = np.tile(
                np.asarray([[sigma_rho, sigma_omega]], np.float32), (e, 1)
            )
        ew[:e, :3] = 1.0 / edge_sigmas[:, :1]
        ew[:e, 3:] = 1.0 / edge_sigmas[:, 1:2]
        em[:e] = 1.0
        if switchable is not None:
            esw[:e] = np.asarray(switchable, np.float32)

    rest = _empty_like(n_poses)
    if prior_z is not None:
        rest["prior_z"] = np.asarray(prior_z, np.float32)
        rest["prior_w"] = np.full(n_poses, 1.0 / sigma_z, np.float32)
        rest["prior_mask"] = np.ones(n_poses, np.float32)
    if dz_edges:
        d = len(dz_edges)
        rest["dz_i"] = np.asarray([i for i, _, _ in dz_edges], np.int32)
        rest["dz_j"] = np.asarray([j for _, j, _ in dz_edges], np.int32)
        rest["dz"] = np.asarray([v for _, _, v in dz_edges], np.float32)
        rest["dz_w"] = np.full(d, 1.0 / sigma_dz, np.float32)
        rest["dz_mask"] = np.ones(d, np.float32)
    return PoseGraphFactors(
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_R=jnp.asarray(eR),
        edge_t=jnp.asarray(et),
        edge_w=jnp.asarray(ew),
        edge_mask=jnp.asarray(em),
        edge_switch=jnp.asarray(esw),
        **{k: jnp.asarray(v) for k, v in rest.items()},
    )


def _residuals(xi, ds, R, t, s, f: PoseGraphFactors, anchor, huber_delta,
               switch_prior_w):
    """Flat weighted residual vector at tangent perturbation xi (N, 6) and
    switch perturbation ds (E,) around switch state s (E,).

    Switchable Constraints (Suenderhauf & Protzel, IROS 2012): each loop
    edge with f.edge_switch = 1 gets a scalar s that SCALES its residual,
    plus a prior (1 - s) pulling it on; the optimizer turns outlier
    closures off by driving their s to 0. Rigid edges (odometry) keep
    scale 1."""
    Rp, tp = se3_retract(R, t, xi)
    # between factors: Log(Z^-1 * T_i^-1 * T_j)
    Ri_inv, ti_inv = se3_inv(Rp[f.edge_i], tp[f.edge_i])
    Rrel, trel = se3_compose(Ri_inv, ti_inv, Rp[f.edge_j], tp[f.edge_j])
    Zi_R, Zi_t = se3_inv(f.edge_R, f.edge_t)
    Rerr, terr = se3_compose(Zi_R, Zi_t, Rrel, trel)
    r_edge = se3_log(Rerr, terr) * f.edge_w * f.edge_mask[:, None]  # (E, 6)
    s_cur = s + ds
    # clamp only the applied scale (gradient flows inside [0, 1]; the
    # linear prior below pulls wanderers back into range)
    scale = jnp.where(f.edge_switch > 0, jnp.clip(s_cur, 0.0, 1.0), 1.0)
    r_edge = r_edge * scale[:, None]
    if huber_delta is not None:
        # IRLS-style robust reweighting: scale each edge's residual block by
        # sqrt(w_huber); the weight itself is frozen (stop_gradient) so GN
        # sees a quadratic local model
        nrm = jnp.sqrt(jnp.sum(r_edge**2, axis=-1) + 1e-12)
        w = jnp.minimum(1.0, huber_delta / nrm)
        r_edge = r_edge * jnp.sqrt(jax.lax.stop_gradient(w))[:, None]
    r_switch = (1.0 - s_cur) * switch_prior_w * f.edge_switch * f.edge_mask
    r_prior = (tp[:, 2] - f.prior_z) * f.prior_w * f.prior_mask  # (N,)
    r_dz = (
        (tp[f.dz_j, 2] - tp[f.dz_i, 2] - f.dz) * f.dz_w * f.dz_mask
    )  # (D,)
    # 6-dof gauge anchor on pose 0
    aR_inv, at_inv = se3_inv(anchor[0], anchor[1])
    r_anchor = se3_log(*se3_compose(aR_inv, at_inv, Rp[0], tp[0])) * 1e3
    return jnp.concatenate(
        [r_edge.ravel(), r_switch, r_prior, r_dz, r_anchor]
    )


def _cg(matvec, b, iters: int):
    """Fixed-iteration conjugate gradient (lax.scan); x0 = 0."""

    def body(carry, _):
        x, r, p, rs = carry
        Ap = matvec(p)
        denom = jnp.maximum(jnp.vdot(p, Ap), 1e-20)
        alpha = rs / denom
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
        return (x, r, p, rs_new), None

    x0 = jnp.zeros_like(b)
    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, b, b, jnp.vdot(b, b)), None, length=iters
    )
    return x


def _edge_r2(R, t, f: PoseGraphFactors) -> jnp.ndarray:
    """Whitened squared between-factor residuals at (R, t): (E,) sums of
    the 6 information-weighted tangent components (padding rows -> 0)."""
    Ri_inv, ti_inv = se3_inv(R[f.edge_i], t[f.edge_i])
    Rrel, trel = se3_compose(Ri_inv, ti_inv, R[f.edge_j], t[f.edge_j])
    Zi_R, Zi_t = se3_inv(f.edge_R, f.edge_t)
    Rerr, terr = se3_compose(Zi_R, Zi_t, Rrel, trel)
    r = se3_log(Rerr, terr) * f.edge_w * f.edge_mask[:, None]
    return jnp.sum(r * r, axis=-1)


def optimize_pose_graph_gnc(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    factors: PoseGraphFactors,
    cost_type: str = "gm",
    barcsq: float = 16.81,
    mu_step: float = 1.4,
    # the anneal must RUN TO mu=1 (GM): mu0 ~ 2*r2max/barcsq is ~1e3 on a
    # typical drifted init, needing ~log_1.4(mu0) ~ 21+ rounds — a short
    # schedule stops with weights ~1 and silently rejects nothing
    # (measured in BENCH_NOTES.md), hence the generous default
    outer_iters: int = 30,
    inner_iters: int = 3,
    cg_iters: int = 64,
    damping: float = 1e-6,
):
    """Graduated Non-Convexity robust optimization (Yang et al., RA-L
    2020) — the outlier-rejection method the reference configures for
    Kimera-RPGO on this dataset (config/kimera/ISEC_params.yaml:223-266:
    outlier_method 2 = GNC, gnc_cost_type 1 = Geman-McClure,
    gnc_weights_tolerance 1e-4, mu step 1.4 = the GTSAM GncParams
    default). The third robust back-end next to Huber and Switchable
    Constraints, for the gate-vs-robust-solver ablation (opt/demo.py).

    GNC edges are the ones flagged in `factors.edge_switch` (loop
    closures — the same flag Switchable Constraints uses); odometry,
    priors and the anchor stay quadratic. Each between-factor gets a
    weight w in [0, 1] that scales its sqrt-information; GNC alternates
    (1) a weighted Gauss-Newton solve and (2) a closed-form weight
    update under a graduated surrogate cost, annealing the convexity
    parameter mu each round — one fully-jitted program (nested
    lax.scans), no Python in the loop.

    cost_type: "gm" (Geman-McClure, the reference's choice: weights
    anneal smoothly, mu -> 1) or "tls" (Truncated Least Squares:
    weights converge to binary, mu -> inf).

    barcsq is the squared inlier threshold on the WHITENED 6-dof
    residual; the default 16.81 = chi2(0.99, 6 dof). (The reference's
    gnc_barcsq 1.0 lives in GTSAM's normalized-by-threshold convention.)
    For TLS, barcsq must sit above each inlier edge's residual at the
    estimate reachable WITHOUT that edge (e.g. drifted odometry): TLS
    hard-cuts and never re-opens an edge whose residual stays over the
    threshold, while GM's soft weights keep pulling and recover — one
    reason the reference's config chooses GM for this dataset
    (tests/test_pose_graph.py::test_gnc_tls_unit_rejects_outlier_edge
    pins the trap).

    Returns (R, t, cost_trace, weights): cost_trace (outer_iters + 1,)
    is the weighted cost at the start of each outer round plus the FINAL
    weighted cost at the returned estimate; weights (E,) are the final
    per-edge GNC weights (1.0 for non-GNC edges); weight < 0.5 = edge
    effectively rejected as an outlier. (cost entries are weighted —
    not directly comparable to optimize_pose_graph's unweighted trace.)
    """
    if cost_type not in ("gm", "tls"):
        raise ValueError(f"cost_type must be 'gm' or 'tls': {cost_type!r}")
    return _gnc_jit(
        R0, t0, factors, outer_iters, inner_iters, cg_iters,
        float(damping), float(barcsq), cost_type == "gm", float(mu_step),
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 8))
def _gnc_jit(R0, t0, factors, outer_iters, inner_iters, cg_iters, damping,
             barcsq, cost_is_gm, mu_step):
    anchor = (R0[0], t0[0])
    N = R0.shape[0]
    E = factors.edge_i.shape[0]
    gnc_mask = factors.edge_switch > 0
    # GNC owns the robustness: the inner solve is plain GN (no SC scaling,
    # no Huber) on weight-scaled factors
    f_plain = factors._replace(edge_switch=jnp.zeros_like(factors.edge_switch))

    def inner(R, t, w):
        f_w = f_plain._replace(edge_w=f_plain.edge_w * jnp.sqrt(w)[:, None])

        def gn_step(carry, _):
            R, t = carry

            def res(p):
                return _residuals(
                    p.reshape(N, 6), jnp.zeros(E, R.dtype), R, t,
                    jnp.ones(E, R.dtype), f_w, anchor, None, 0.0,
                )

            zero = jnp.zeros(N * 6, R.dtype)
            r0, pullback = jax.vjp(res, zero)
            b = -pullback(r0)[0]

            def mv(v):
                return pullback(jax.jvp(res, (zero,), (v,))[1])[0] + damping * v

            step = _cg(mv, b, cg_iters)
            Rn, tn = se3_retract(R, t, step.reshape(N, 6))
            u, _, vt = jnp.linalg.svd(Rn)
            return (u @ vt, tn), 0.5 * jnp.vdot(r0, r0)

        (R, t), costs = jax.lax.scan(gn_step, (R, t), None, length=inner_iters)
        return R, t, costs[0]

    # mu init from the worst GNC-edge residual at the initial estimate
    # (Yang et al. Sec. III-B: start near-convex)
    r2_0 = _edge_r2(R0, t0, factors)
    rmax2 = jnp.maximum(jnp.max(jnp.where(gnc_mask, r2_0, 0.0)), barcsq)
    if cost_is_gm:
        mu0 = jnp.maximum(1.0, 2.0 * rmax2 / barcsq)
    else:
        mu0 = jnp.clip(barcsq / jnp.maximum(2.0 * rmax2 - barcsq, 1e-6),
                       1e-6, 1e6)

    def outer(carry, _):
        R, t, mu, w = carry
        R, t, cost = inner(R, t, w)
        r2 = _edge_r2(R, t, factors)
        if cost_is_gm:
            w_new = (mu * barcsq / (r2 + mu * barcsq)) ** 2
            mu_n = jnp.maximum(1.0, mu / mu_step)
        else:
            th_hi = (mu + 1.0) / mu * barcsq
            th_lo = mu / (mu + 1.0) * barcsq
            w_mid = jnp.sqrt(
                barcsq * mu * (mu + 1.0) / jnp.maximum(r2, 1e-12)
            ) - mu
            w_new = jnp.where(
                r2 >= th_hi, 0.0,
                jnp.where(r2 <= th_lo, 1.0, jnp.clip(w_mid, 0.0, 1.0)),
            )
            mu_n = mu * mu_step
        w_new = jnp.where(gnc_mask, w_new, 1.0)
        return (R, t, mu_n, w_new), cost

    w0 = jnp.ones(E, R0.dtype)
    (R, t, _, w), costs = jax.lax.scan(
        outer, (R0, t0, mu0, w0), None, length=outer_iters
    )
    # final weighted cost at the returned estimate (the per-round trace
    # entries are start-of-round costs, one solve behind)
    f_fin = f_plain._replace(edge_w=f_plain.edge_w * jnp.sqrt(w)[:, None])
    r_fin = _residuals(
        jnp.zeros((N, 6), R0.dtype), jnp.zeros(E, R0.dtype), R, t,
        jnp.ones(E, R0.dtype), f_fin, anchor, None, 0.0,
    )
    cost_fin = 0.5 * jnp.vdot(r_fin, r_fin)
    return R, t, jnp.concatenate([costs, cost_fin[None]]), w


def optimize_pose_graph(
    R0: jnp.ndarray,  # (N, 3, 3) initial rotations
    t0: jnp.ndarray,  # (N, 3) initial translations
    factors: PoseGraphFactors,
    num_iters: int = 15,
    cg_iters: int = 64,
    damping: float = 1e-6,
    huber_delta: Optional[float] = None,
    # Switchable-Constraints prior weight (1/sigma of the s -> 1 pull).
    # SC is known to be sensitive to this (Suenderhauf's Xi tuning): on
    # the demo scene w=10 cleanly disables exactly the false closures,
    # w=5 lands in a bad local minimum, w<=2 turns true closures off too
    # (measured sweep in BENCH_NOTES.md).
    switch_prior_w: float = 10.0,
):
    """Jitted Gauss-Newton over the factor graph.

    Returns (R, t, cost_trace, switches): cost_trace has num_iters + 1
    entries (initial cost first); switches (E,) are the final Switchable-
    Constraints values for edges flagged in factors.edge_switch (1.0
    elsewhere). Matrix-free: each CG step evaluates one jvp and one vjp
    of the residual sweep; the switch variables ride the same flat
    parameter vector as the pose tangents.
    """
    return _optimize_jit(
        R0, t0, factors, num_iters, cg_iters, damping,
        -1.0 if huber_delta is None else float(huber_delta),
        float(switch_prior_w),
    )


@partial(jax.jit, static_argnums=(3, 4, 6))
def _optimize_jit(R0, t0, factors, num_iters, cg_iters, damping, huber_delta,
                  switch_prior_w):
    anchor = (R0[0], t0[0])
    hd = None if huber_delta < 0 else huber_delta
    N = R0.shape[0]
    E = factors.edge_i.shape[0]

    def gn_step(carry, _):
        R, t, s = carry

        def res(p):
            xi = p[: N * 6].reshape(N, 6)
            ds = p[N * 6 :]
            return _residuals(
                xi, ds, R, t, s, factors, anchor, hd, switch_prior_w
            )

        zero = jnp.zeros(N * 6 + E, R.dtype)
        r0, pullback = jax.vjp(res, zero)
        b = -pullback(r0)[0]

        def normal_matvec(v):
            jv = jax.jvp(res, (zero,), (v,))[1]
            return pullback(jv)[0] + damping * v

        step = _cg(normal_matvec, b, cg_iters)
        Rn, tn = se3_retract(R, t, step[: N * 6].reshape(N, 6))
        sn = s + step[N * 6 :]
        # re-orthonormalize accumulated rotations (float32 drift)
        u, _, vt = jnp.linalg.svd(Rn)
        Rn = u @ vt
        cost = 0.5 * jnp.vdot(r0, r0)
        return (Rn, tn, sn), cost

    s0 = jnp.ones(E, R0.dtype)
    r_init = _residuals(
        jnp.zeros((N, 6), R0.dtype), jnp.zeros(E, R0.dtype),
        R0, t0, s0, factors, anchor, hd, switch_prior_w,
    )
    cost0 = 0.5 * jnp.vdot(r_init, r_init)
    (R, t, s), costs = jax.lax.scan(gn_step, (R0, t0, s0), None, length=num_iters)
    return R, t, jnp.concatenate([cost0[None], costs]), s
