"""Batched SO(3)/SE(3) Lie-group exp/log maps in JAX.

The tangent-space parameterization behind the TPU-native pose-graph
optimizer (opt/pose_graph.py). Everything is batched over arbitrary
leading axes, static-shaped, differentiable, and safe at theta -> 0 via
Taylor branches selected with `jnp.where` on masked-safe operands (the
standard JAX idiom: both branches are computed, so the singular branch
must not produce NaNs even where unused).

Tangent convention: xi = [rho (3), omega (3)] with the translation part
first; the retraction is the RIGHT perturbation T <- T @ Exp(xi).

The reference has no analogue (it delegates factor-graph optimization to
GTSAM inside the upstream SLAM systems; see loop_closure_gate.py:151-213
which only EMITS factors) — this module exists so the gate's factors can
be consumed end-to-end on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
# Taylor-branch cutoff on theta^2 (theta < 0.01 rad). Must be LARGE for
# float32: (1 - cos(theta)) cancels to exactly 0.0f for theta^2 up to
# ~1.2e-7 (making B = (1-cos)/t^2 zero and V^-1 divide by it), while the
# Taylor error at theta = 0.01 is ~theta^4/120 ~ 1e-10 — far below f32
# eps. So the series is the MORE accurate branch everywhere under the
# cutoff, not an approximation.
_SMALL = 1e-4


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix [w]x."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def vee(W):
    """(..., 3, 3) skew-symmetric -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _sin_coeffs(theta_sq):
    """Rodrigues coefficients A = sin(t)/t, B = (1-cos(t))/t^2,
    C = (1-A)/t^2 with Taylor branches at t -> 0.

    Double-where trick throughout: the unselected branch must stay finite
    AND have a finite derivative, because `where`'s vjp multiplies the
    unselected branch's cotangent by zero — and 0 * inf = NaN. Dividing by
    the raw theta_sq would make d/d(theta_sq) infinite at 0."""
    small = theta_sq < _SMALL
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - a) / ts_safe)
    return a, b, c


def so3_exp(w):
    """(..., 3) axis-angle -> (..., 3, 3) rotation (Rodrigues)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sin_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R):
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Accurate away from theta = pi (pose-graph residuals live near 0).
    AUTODIFF-SAFE at theta -> 0: theta comes from atan2(sin, cos) (smooth
    at (0, 1), unlike arccos whose gradient blows up at cos -> 1), and the
    small-angle branch is selected with the double-where trick so the
    unselected branch never divides by ~0 inside a vjp.
    """
    w_vee = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin_sq = jnp.sum(w_vee * w_vee, axis=-1) * 0.25  # sin^2(theta)
    cos_t = jnp.clip(
        (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0
    )
    small = sin_sq < _SMALL
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, sin_sq))
    theta = jnp.arctan2(sin_safe, cos_t)
    # w = theta / (2 sin) * vee; Taylor (theta^2 ~ 2(1 - cos)):
    # 1/2 + theta^2/12 ~ 1/2 + (1 - cos)/6
    scale = jnp.where(
        small, 0.5 + (1.0 - cos_t) / 6.0, theta / (2.0 * sin_safe)
    )
    return scale[..., None] * w_vee


def se3_exp(xi):
    """(..., 6) [rho, omega] -> ((..., 3, 3) R, (..., 3) t) with t = V rho."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sin_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * WW
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """((..., 3, 3), (..., 3)) -> (..., 6) [rho, omega] with rho = V^-1 t."""
    w = so3_log(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sin_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), W.shape)
    # V^-1 = I - W/2 + k WW,  k = (1 - A/(2B)) / t^2; Taylor k -> 1/12.
    # Same double-where discipline as _sin_coeffs (safe denominators in
    # the unselected branch keep the vjp NaN-free at theta -> 0).
    small = theta_sq < _SMALL
    ts_safe = jnp.where(small, 1.0, theta_sq)
    b_safe = jnp.where(small, 0.5, b)
    k = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - a / (2.0 * b_safe)) / ts_safe,
    )
    V_inv = eye - 0.5 * W + k[..., None, None] * WW
    rho = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([rho, w], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra, ta) @ (Rb, tb): batched rigid-transform composition."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inv(R, t):
    """Batched rigid-transform inverse."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_retract(R, t, xi):
    """Right-perturbation retraction: T <- T @ Exp(xi), batched."""
    dR, dt = se3_exp(xi)
    return se3_compose(R, t, dR, dt)
