"""Multi-chip full-gate inference step over a device mesh.

SURVEY §2.9: the reference has no distributed execution, so scaling the
north-star gate path (VPR encode -> retrieval -> floor gate -> geometric
verification) is green-field TPU design. Decomposition:

  * ENCODE + DETECT shard the keyframe axis over `data` — embarrassingly
    parallel, zero communication.
  * RETRIEVAL all-gathers the (N, D) descriptor matrix over ICI (small:
    4096-d f32 descriptors are 16 KB/frame) so each device retrieves for
    its own query slab against the full database — the query-sharded
    layout of parallel/distributed_knn.py.
  * GATE + BUDGETED SELECTION stay device-local per query slab with
    DIRECTED match semantics (the reference's VPR counting,
    place_recognition.py:851-911); global statistics come from one psum.
  * VERIFY runs the fused match+RANSAC program on each device's top-B
    accepted pairs (static per-device budget). Keypoints are all-gathered
    once; pairs may span shards, so every device holds the full keypoint
    table (at 1024 kpts x 256-d bf16 descriptors this is ~0.5 MB/frame —
    replication is the right call below ~10k keyframes; beyond that,
    shard the pair list and ppermute keypoint slabs instead).

Everything is a single shard_map program: XLA inserts the all_gathers and
the psum on ICI, and the host sees one dispatch.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mlis_tpu.ops.knn import cosine_topk
from mlis_tpu.parallel.mesh import DATA_AXIS


_PROGRAM_CACHE: Dict = {}


def make_sharded_gate_program(
    mesh: Mesh,
    matcher,
    encode_fn: Callable,
    n_frames: int,
    hw: Tuple[int, int],
    K: np.ndarray,
    *,
    top_k: int,
    threshold: float,
    min_time_gap: float,
    budget: int,
    ransac_threshold: float = 3.0,
    match_top_k: int = 0,
) -> Callable:
    """Build (and cache) the jitted one-dispatch sharded gate program:
    (images, t_loc, fl_loc, t_all, fl_all) -> (qi, mi, slot_ok, n_match,
    n_inliers, ratio, n_confident, stats, per_device_accepted).

    Caching matters through the TPU tunnel: a fresh jit per call would
    pay a fresh remote compile (~1-3 min) on every invocation — the
    single-chip pipeline caches its mega/fused programs the same way.
    """
    from mlis_tpu.ops.image import to_grayscale

    H, W = hw
    h8, w8 = (H // 8) * 8, (W // 8) * 8
    n_dev = mesh.shape[DATA_AXIS]
    shard = n_frames // n_dev
    kk = min(top_k, n_frames)
    B = int(budget)
    cache_key = (
        id(mesh), id(matcher), id(encode_fn), n_frames, hw,
        float(np.asarray(K)[0, 0]), kk, float(threshold),
        float(min_time_gap), B, float(ransac_threshold), int(match_top_k),
    )
    if cache_key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[cache_key][0]

    fused = matcher.make_fused_match_verify(hw, K, ransac_threshold)
    m_params = matcher.params
    # initialize the detector OUTSIDE the traced program (lazy init inside
    # shard_map would leak tracers into the param cache)
    matcher.sp.init_params((h8, w8))

    def local(imgs, t_loc, fl_loc, t_all, fl_all):
        # encode + detect: device-local keyframe slab
        desc_loc = encode_fn(imgs)  # (shard, D)
        gray = to_grayscale(imgs, size=(h8, w8))
        kp_loc = matcher.sp.detect(gray)
        if (h8, w8) != (H, W):
            kp_loc = kp_loc._replace(
                coords=kp_loc.coords
                * jnp.asarray([W / w8, H / h8], jnp.float32)
            )
        if match_top_k and match_top_k < kp_loc.coords.shape[1]:
            # keypoints are detector-score-sorted, so the pruned set
            # is a prefix slice (prefix-valid mask preserved)
            kp_loc = jax.tree_util.tree_map(
                lambda x: x[:, :match_top_k], kp_loc
            )

        # replicate descriptors + keypoints over ICI
        desc_all = jax.lax.all_gather(desc_loc, DATA_AXIS, tiled=True)
        kp_all = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, DATA_AXIS, tiled=True), kp_loc
        )

        # retrieval: local query slab vs the full database
        scores, idx = cosine_topk(
            desc_loc, desc_all, t_loc, t_all, k=kk,
            min_time_gap=min_time_gap,
        )
        valid = jnp.isfinite(scores) & (scores >= threshold)
        accept = valid & (fl_loc[:, None] == fl_all[idx])

        # global directed statistics: one psum each
        total = jax.lax.psum(valid.sum(), DATA_AXIS)
        rejected = jax.lax.psum((valid & ~accept).sum(), DATA_AXIS)
        accepted = jax.lax.psum(accept.sum(), DATA_AXIS)
        acc_cnt = accept.sum()  # this device's accepted count

        # budgeted selection: this device's top-B accepted pairs by score
        flat = jnp.where(accept, scores, -jnp.inf).reshape(-1)
        top_s, pos = jax.lax.top_k(flat, B)
        slot_ok = jnp.isfinite(top_s)
        dev = jax.lax.axis_index(DATA_AXIS)
        qi = jnp.where(slot_ok, dev * shard + pos // kk, 0)
        mi = jnp.where(slot_ok, idx.reshape(-1)[pos], 0)

        out = fused(
            m_params, kp_all, qi, mi, jax.random.fold_in(
                jax.random.PRNGKey(0), dev
            ),
        )
        _, _, n_match, n_inl, ratio, _, _, n_conf = out
        return (
            qi.astype(jnp.int32),
            mi.astype(jnp.int32),
            slot_ok,
            n_match.astype(jnp.int32),
            n_inl.astype(jnp.int32),
            ratio,
            n_conf.astype(jnp.int32),
            jnp.stack([total, rejected, accepted]),
            acc_cnt.astype(jnp.int32)[None],
        )

    prog = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
            out_specs=(
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(),
                P(DATA_AXIS),
            ),
            check_vma=False,
        )
    )
    # the cache holds STRONG references to the keyed objects: id() keys
    # alone could alias a new matcher/mesh that reuses a collected
    # object's id and serve it a stale program (the program closes over
    # matcher.params at build time)
    _PROGRAM_CACHE[cache_key] = (prog, mesh, matcher, encode_fn)
    return prog


def sharded_full_gate_step(
    mesh: Mesh,
    matcher,  # LightGlue-style: .sp.detect, .make_fused_match_verify, .params
    encode_fn: Callable,  # (B, H, W, C) uint8/float -> (B, D) descriptors
    images: np.ndarray,  # (N, H, W, C); N divisible by mesh data size
    timestamps: np.ndarray,
    floor_labels: np.ndarray,
    K: np.ndarray,
    top_k: int = 10,
    threshold: float = 0.5,
    min_time_gap: float = 10.0,
    per_device_budget: int = 16,
    ransac_threshold: float = 3.0,
    exact: bool = True,
    match_top_k: int = 0,
) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    """One multi-chip gate step.

    Returns (verdicts, stats):
      verdicts: dict of (n_dev * budget,) arrays — qi, mi, slot_valid,
        n_matches, n_inliers, inlier_ratio — for each device's budgeted
        accepted pairs (slot_valid False marks unused budget slots).
      stats: global DIRECTED counts {total, rejected, accepted} (psum),
        plus {verified, dropped, budget_used}.

    Exactness contract (mirrors the single-chip fused path's overflow
    fallback, gating/full_gate.py): when `exact` (default) and any
    device's accepted count overflows per_device_budget, the step reruns
    with the budget raised to the next power of two >= the max per-device
    accepted count — so accepted pairs are NEVER silently dropped.
    With exact=False, overflow keeps each device's top-budget pairs by
    score and reports the drop in stats['dropped'] instead of hiding it.

    match_top_k > 0 prunes each keyframe's keypoints to the top-K by
    detector score BEFORE the all_gather (the single-chip pipeline's
    detect-1024/match-512 protocol, gating/full_gate.py match_top_k) —
    same decision contract, and the replicated keypoint table shrinks
    proportionally (the dominant ICI all-gather term at bench shapes).
    """
    n_dev = mesh.shape[DATA_AXIS]
    N = int(images.shape[0])
    if N % n_dev:
        raise ValueError(f"{N} keyframes do not shard over {n_dev} devices")
    shard = N // n_dev
    H, W = int(images.shape[1]), int(images.shape[2])
    hw = (H, W)
    kk = min(top_k, N)
    # clamp: each device's candidate pool is shard * kk entries, so a
    # larger budget would make lax.top_k fail with an opaque XLA error
    # (slot_valid already marks unused slots, so shrinking is safe)
    B = min(int(per_device_budget), shard * kk)

    def make_local(B: int):
        return make_sharded_gate_program(
            mesh, matcher, encode_fn, N, hw, K,
            top_k=top_k, threshold=threshold, min_time_gap=min_time_gap,
            budget=B, ransac_threshold=ransac_threshold,
            match_top_k=match_top_k,
        )

    t = jnp.asarray(np.asarray(timestamps, np.float32))
    fl = jnp.asarray(np.asarray(floor_labels, np.int32))
    imgs_dev = jnp.asarray(images)

    def run(B: int):
        qi, mi, ok, n_match, n_inl, ratio, n_conf, stats, dev_acc = (
            make_local(B)
        )(imgs_dev, t, fl, t, fl)
        return (
            np.asarray(qi), np.asarray(mi), np.asarray(ok),
            np.asarray(n_match), np.asarray(n_inl), np.asarray(ratio),
            np.asarray(n_conf), np.asarray(stats), np.asarray(dev_acc),
        )

    qi, mi, ok, n_match, n_inl, ratio, n_conf, stats, dev_acc = run(B)
    max_acc = int(dev_acc.max()) if n_dev else 0
    if exact and max_acc > B:
        # overflow: raise the budget to the next power of two covering the
        # worst device (power-of-2 bounds the number of distinct compiled
        # shapes) and rerun — the accepted sets don't depend on B, so one
        # rerun restores exactness
        B = min(1 << (max_acc - 1).bit_length(), shard * kk)
        qi, mi, ok, n_match, n_inl, ratio, n_conf, stats, dev_acc = run(B)
    verdicts = {
        "qi": qi,
        "mi": mi,
        "slot_valid": ok,
        "n_matches": n_match,
        "n_inliers": n_inl,
        "inlier_ratio": ratio,
        "n_confident": n_conf,
    }
    return verdicts, {
        "total": int(stats[0]),
        "rejected": int(stats[1]),
        "accepted": int(stats[2]),
        "verified": int(ok.sum()),
        "dropped": int(np.maximum(dev_acc - B, 0).sum()),
        "budget_used": B,
    }
