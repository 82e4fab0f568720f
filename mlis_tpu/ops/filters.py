"""1-D signal filters as vectorized jax.numpy ops.

`uniform_filter1d` reproduces scipy.ndimage.uniform_filter1d semantics
(mode='reflect', origin=0) — the reference smooths IMU channels with it
(scripts/semantic_gating/floor_detector.py:82-83). Implemented as a cumsum
over a reflect-padded array: O(N) regardless of window size, and jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size",))
def uniform_filter1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter, scipy 'reflect' boundary ((d c b a | a b c d)).

    For window `size`, output[i] averages input[i - size//2 .. i + (size-1)//2]
    (left-biased window for even sizes, matching scipy origin=0).
    """
    if size <= 1:
        return x
    n = x.shape[0]
    left = size // 2
    right = size - left - 1  # (size-1)//2

    # scipy 'reflect': repeat edge samples (a b c | c b a), not 'mirror'
    pad_l = x[:left][::-1] if left > 0 else x[:0]
    pad_r = x[n - right :][::-1] if right > 0 else x[:0]
    xp = jnp.concatenate([pad_l, x, pad_r])

    c = jnp.cumsum(xp, dtype=jnp.float64 if x.dtype == jnp.float64 else jnp.float32)
    c = jnp.concatenate([jnp.zeros(1, dtype=c.dtype), c])
    return (c[size:] - c[:-size]) / size


@jax.jit
def cumtrapz(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cumulative trapezoidal integral, length N, T[0] = 0.

    trapz(y[s:e], x[s:e]) == cumtrapz(y, x)[e-1] - cumtrapz(y, x)[s]
    — used to evaluate per-event integrals without slicing.
    """
    seg = 0.5 * (y[1:] + y[:-1]) * (x[1:] - x[:-1])
    return jnp.concatenate([jnp.zeros(1, dtype=seg.dtype), jnp.cumsum(seg)])
