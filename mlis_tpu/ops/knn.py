"""Batched cosine-similarity retrieval (kNN) for place recognition.

Replaces the reference's per-query Python loop over an N x N numpy
similarity matrix (place_recognition.py:851-911) with a tiled, jitted
scan: query chunks hit the MXU as (chunk, D) x (D, N) GEMMs in bfloat16
with float32 accumulation, temporal/self masking is fused, and
`jax.lax.top_k` runs on-chip. Memory stays O(chunk * N) so the same code
path scales past the 19k-keyframe NUFR-M3F database.

Tie-breaking note: the reference's `np.argsort(sims)[::-1]` prefers the
HIGHER index on exact ties; `lax.top_k` prefers the lower. Exact float ties
do not occur with real descriptors; decision-level parity is unaffected.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-jnp.inf)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    """Row normalization with the reference's +eps convention
    (place_recognition.py:166-169)."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "compute_dtype"))
def cosine_topk(
    queries: jnp.ndarray,  # (Q, D)
    database: jnp.ndarray,  # (N, D)
    query_times: Optional[jnp.ndarray] = None,  # (Q,)
    db_times: Optional[jnp.ndarray] = None,  # (N,)
    k: int = 10,
    min_time_gap: float = 10.0,
    chunk: int = 1024,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine matches per query with temporal-neighbor masking.

    Returns (scores (Q, k) float32, indices (Q, k) int32). Masked entries
    come back as -inf scores.
    """
    Q, D = queries.shape
    N = database.shape[0]

    qn = l2_normalize(queries.astype(jnp.float32)).astype(compute_dtype)
    dbn = l2_normalize(database.astype(jnp.float32)).astype(compute_dtype)
    dbn_t = dbn.T  # (D, N)

    n_chunks = -(-Q // chunk)
    pad = n_chunks * chunk - Q
    qn_p = jnp.pad(qn, ((0, pad), (0, 0)))
    qt_p = (
        jnp.pad(query_times, (0, pad), constant_values=jnp.inf)
        if query_times is not None
        else None
    )
    qn_c = qn_p.reshape(n_chunks, chunk, D)
    qt_c = qt_p.reshape(n_chunks, chunk) if qt_p is not None else None

    def one_chunk(args):
        q, qt = args
        sims = jnp.dot(q, dbn_t, preferred_element_type=jnp.float32)
        if qt is not None and db_times is not None:
            gap = jnp.abs(db_times[None, :] - qt[:, None])
            sims = jnp.where(gap < min_time_gap, NEG_INF, sims)
        scores, idx = jax.lax.top_k(sims, k)
        return scores, idx.astype(jnp.int32)

    if qt_c is not None:
        scores, idx = jax.lax.map(one_chunk, (qn_c, qt_c))
    else:
        scores, idx = jax.lax.map(lambda q: one_chunk((q, None)), qn_c)

    scores = scores.reshape(n_chunks * chunk, k)[:Q]
    idx = idx.reshape(n_chunks * chunk, k)[:Q]
    return scores, idx


@functools.partial(jax.jit, static_argnames=("chunk", "compute_dtype"))
def pairwise_similarity(
    descriptors: jnp.ndarray,
    chunk: int = 2048,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full N x N cosine similarity matrix (reference :179-190), tiled."""
    N, D = descriptors.shape
    dn = l2_normalize(descriptors.astype(jnp.float32)).astype(compute_dtype)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    dp = jnp.pad(dn, ((0, pad), (0, 0)))
    rows = dp.reshape(n_chunks, chunk, D)
    out = jax.lax.map(
        lambda r: jnp.dot(r, dn.T, preferred_element_type=jnp.float32), rows
    )
    return out.reshape(n_chunks * chunk, N)[:N]


def loop_closure_topk(
    descriptors: jnp.ndarray,  # (N, D)
    timestamps: jnp.ndarray,  # (N,)
    k: int = 10,
    min_time_gap: float = 10.0,
    chunk: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-queries-vs-database retrieval for loop-closure search: each frame
    queries the full DB with itself and its temporal neighbors masked
    (reference find_loop_closures, place_recognition.py:873-886)."""
    scores, idx = cosine_topk(
        descriptors,
        descriptors,
        timestamps,
        timestamps,
        k=k,
        min_time_gap=min_time_gap,
        chunk=chunk,
    )
    return np.asarray(scores), np.asarray(idx)
