"""Sharded cosine top-k retrieval over a device mesh.

SURVEY §2.9: the reference has no distributed execution; scaling the
keyframe database is green-field design. Layout: the QUERY axis shards
over `data` (embarrassingly parallel — each device owns a query slab and
scans the full DB); the database replicates up to HBM limits. For DBs too
large to replicate, `db_sharded_topk` shards the DATABASE axis instead and
merges per-shard top-k with one all_gather over ICI (k << N, so the
collective moves k results per device, not the similarity matrix).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mlis_tpu.ops.knn import cosine_topk
from mlis_tpu.parallel.mesh import DATA_AXIS


def query_sharded_topk(
    mesh: Mesh,
    queries: jnp.ndarray,  # (Q, D) — Q divisible by mesh data size
    database: jnp.ndarray,  # (N, D) replicated
    query_times: Optional[jnp.ndarray] = None,
    db_times: Optional[jnp.ndarray] = None,
    k: int = 10,
    min_time_gap: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Each device retrieves for its slab of queries against the full DB."""

    def local(q, qt, db, dbt):
        return cosine_topk(
            q, db, qt, dbt, k=k, min_time_gap=min_time_gap
        )

    if query_times is None:
        query_times = jnp.zeros(queries.shape[0], jnp.float32)
        db_times = jnp.full(database.shape[0], 1e18, jnp.float32)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)(queries, query_times, database, db_times)


def db_sharded_topk(
    mesh: Mesh,
    queries: jnp.ndarray,  # (Q, D) replicated
    database: jnp.ndarray,  # (N, D) — N divisible by mesh data size
    query_times: Optional[jnp.ndarray] = None,
    db_times: Optional[jnp.ndarray] = None,
    k: int = 10,
    min_time_gap: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Database sharded over `data`; per-shard top-k merged via all_gather.

    Returns (scores (Q, k), GLOBAL db indices (Q, k)).
    """
    n_dev = mesh.shape[DATA_AXIS]
    N = database.shape[0]
    shard_n = N // n_dev

    if query_times is None:
        query_times = jnp.zeros(queries.shape[0], jnp.float32)
        db_times = jnp.full(N, 1e18, jnp.float32)

    def local(q, qt, db_shard, dbt_shard):
        scores, idx = cosine_topk(
            q, db_shard, qt, dbt_shard, k=k, min_time_gap=min_time_gap
        )
        # globalize indices by this shard's offset
        shard_id = jax.lax.axis_index(DATA_AXIS)
        idx = idx + shard_id * shard_n
        # gather all shards' candidates: (n_dev, Q, k)
        all_scores = jax.lax.all_gather(scores, DATA_AXIS)
        all_idx = jax.lax.all_gather(idx, DATA_AXIS)
        Q = q.shape[0]
        merged_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(Q, n_dev * k)
        merged_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(Q, n_dev * k)
        top_s, pos = jax.lax.top_k(merged_s, k)
        top_i = jnp.take_along_axis(merged_i, pos, axis=1)
        return top_s, top_i

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, query_times, database, db_times)
