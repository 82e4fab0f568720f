"""Log-space Sinkhorn optimal transport as a fixed-iteration lax.scan.

Used by SALAD descriptor aggregation and SuperGlue-style matchers (the
reference configures sinkhorn_iterations: 20 for SuperGlue,
geometric_verification.py:389-399). Fixed iteration counts + static shapes
keep it XLA-friendly; accumulations in float32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_log(
    scores: jnp.ndarray,  # (..., M, N) affinity/cost logits
    num_iters: int = 20,
    log_mu: Optional[jnp.ndarray] = None,  # (..., M) log row marginals
    log_nu: Optional[jnp.ndarray] = None,  # (..., N) log col marginals
) -> jnp.ndarray:
    """Returns log transport plan log P with rows/cols matching marginals.

    Defaults to uniform marginals. All math in float32 log-space.
    """
    s = scores.astype(jnp.float32)
    M, N = s.shape[-2], s.shape[-1]
    if log_mu is None:
        log_mu = jnp.full(s.shape[:-1], -jnp.log(M), jnp.float32)
    if log_nu is None:
        log_nu = jnp.full(s.shape[:-2] + (N,), -jnp.log(N), jnp.float32)

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(s + v[..., None, :], axis=-1)
        v = log_nu - jax.nn.logsumexp(s + u[..., None], axis=-2)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=num_iters)
    return s + u[..., None] + v[..., None, :]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_with_dustbin(
    scores: jnp.ndarray,  # (B, M, N)
    alpha: jnp.ndarray,  # scalar dustbin logit
    num_iters: int = 20,
) -> jnp.ndarray:
    """SuperGlue-style partial assignment: augment with a dustbin row+column
    so unmatched points have somewhere to go, then run log-Sinkhorn.

    Returns the (B, M+1, N+1) log assignment matrix.
    """
    B, M, N = scores.shape
    a = jnp.broadcast_to(alpha.astype(jnp.float32), (B, 1, 1))
    row = jnp.broadcast_to(a, (B, M, 1))
    col = jnp.broadcast_to(a, (B, 1, N))
    corner = a
    aug = jnp.concatenate(
        [
            jnp.concatenate([scores.astype(jnp.float32), row], axis=2),
            jnp.concatenate([col, corner], axis=2),
        ],
        axis=1,
    )  # (B, M+1, N+1)

    norm = -jnp.log(jnp.float32(M + N))
    log_mu = jnp.concatenate(
        [jnp.full((B, M), norm), jnp.full((B, 1), jnp.log(jnp.float32(N)) + norm)],
        axis=1,
    )
    log_nu = jnp.concatenate(
        [jnp.full((B, N), norm), jnp.full((B, 1), jnp.log(jnp.float32(M)) + norm)],
        axis=1,
    )
    out = sinkhorn_log(aug, num_iters, log_mu, log_nu)
    return out - norm  # SuperGlue convention: rescale so P sums to ~1 per point
