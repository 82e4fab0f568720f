"""Online (streaming) semantic loop-closure gate.

The reference consumes whole trajectories offline (its integrations load
complete TUM files, e.g. semantic_gating/loop_closure_gate.py and the
per-algorithm integration scripts); a deployed SLAM front end instead
sees ONE keyframe at a time and needs gated loop-closure candidates with
bounded latency. This module is that serving path, designed TPU-first:

  * a FIXED-CAPACITY device-resident ring buffer of descriptors, floor
    labels, timestamps and global frame ids — static shapes forever, so
    the program compiles exactly once per (capacity, micro_batch) pair;
  * one fused jit dispatch per micro-batch of keyframes: encode (if an
    encoder is attached) -> masked cosine retrieval vs the buffer ->
    floor gate -> top-k -> ring insert, all on device. Through the
    tunnel (per-dispatch RTT ~1 s, CLAUDE.md) micro-batching is the
    difference between 1 s/keyframe and 1 s/batch;
  * frames inside one micro-batch retrieve against each other too: the
    insert happens between scan steps, so frame i sees every frame < i
    exactly like the sequential-arrival semantics require;
  * eviction is oldest-first (ring overwrite) — the bounded-memory
    behavior a long-running system needs, with `evicted` counted.

Decision parity: for a database that has not wrapped, the accepted
candidates equal the offline decision rule applied to the past-only
database — top-k over time-gap-masked bf16 cosine similarities
(ops/knn.cosine_topk numerics), then the similarity threshold, then the
floor gate on the surviving top-k (a gated candidate consumes its slot,
exactly like the offline retrieval->gate composition in
gating/full_gate.py). Pinned by tests/test_streaming_gate.py, including
the small-top-k case where a cross-floor candidate outranks a same-floor
one.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.ops.knn import l2_normalize

NEG_INF = jnp.float32(-jnp.inf)


@dataclass
class StreamingState:
    """Device-resident ring buffer (all arrays stay on device)."""

    desc: jnp.ndarray  # (C, D) l2-normalized f32
    times: jnp.ndarray  # (C,) f32
    floors: jnp.ndarray  # (C,) int32
    ids: jnp.ndarray  # (C,) int32 global frame id, -1 = empty
    count: jnp.ndarray  # () int32 total frames ever inserted


@dataclass
class StreamingMatches:
    """Gated top-k candidates for one micro-batch (host-side view)."""

    query_ids: np.ndarray  # (M,)
    match_ids: np.ndarray  # (M, k) global frame ids, -1 where no match
    scores: np.ndarray  # (M, k) cosine similarity, -inf where no match
    cross_floor_rejected: int  # above-threshold candidates the gate removed

    def pairs(self) -> List[Tuple[int, int, float]]:
        out = []
        for qi, q in enumerate(self.query_ids):
            for j in range(self.match_ids.shape[1]):
                m = int(self.match_ids[qi, j])
                if m >= 0:
                    out.append((int(q), m, float(self.scores[qi, j])))
        return out


def _init_state(capacity: int, dim: int) -> StreamingState:
    return StreamingState(
        desc=jnp.zeros((capacity, dim), jnp.float32),
        times=jnp.full((capacity,), -jnp.inf, jnp.float32),
        floors=jnp.zeros((capacity,), jnp.int32),
        ids=jnp.full((capacity,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k",),
    donate_argnums=(0, 1, 2, 3, 4),
)
def _stream_step(
    desc,
    times,
    floors,
    ids,
    count,
    new_desc,  # (M, D) already l2-normalized
    new_times,  # (M,)
    new_floors,  # (M,) int32
    new_ids,  # (M,) int32
    k: int,
    strict_floor,  # traced bool — no recompile per config
    min_time_gap,
    threshold,
):
    """One micro-batch: sequential retrieve-then-insert over M keyframes
    inside a single compiled program (lax.scan carries the ring buffer)."""
    C = desc.shape[0]

    def body(carry, frame):
        desc, times, floors, ids, count = carry
        d, t, f, gid = frame
        # same numerics as the offline path (ops/knn.cosine_topk):
        # bf16 descriptors, f32 accumulation
        sims = jnp.dot(
            desc.astype(jnp.bfloat16),
            d.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (C,)
        occupied = ids >= 0
        gap_ok = jnp.abs(times - t) >= min_time_gap
        # offline decision order (full_gate.py): top-k over gap-masked
        # sims FIRST, then threshold, then the floor gate on the top-k —
        # a cross-floor candidate that ranks inside the top-k consumes
        # its slot and is then rejected (it does NOT cede the slot to the
        # next same-floor candidate)
        eligible = occupied & gap_ok
        scores, slot = jax.lax.top_k(jnp.where(eligible, sims, NEG_INF), k)
        above = jnp.isfinite(scores) & (scores >= threshold)
        diff = jnp.abs(jnp.take(floors, slot) - f)
        floor_ok = jnp.where(strict_floor, diff == 0, diff <= 1)
        rejected = jnp.sum(above & ~floor_ok)
        accept = above & floor_ok
        scores = jnp.where(accept, scores, NEG_INF)
        match_ids = jnp.where(accept, jnp.take(ids, slot), -1).astype(
            jnp.int32
        )
        # ring insert (oldest-first overwrite once count >= C)
        pos = jnp.mod(count, C)
        carry = (
            desc.at[pos].set(d),
            times.at[pos].set(t),
            floors.at[pos].set(f),
            ids.at[pos].set(gid),
            count + 1,
        )
        return carry, (scores, match_ids, rejected)

    (desc, times, floors, ids, count), (scores, match_ids, rejected) = (
        jax.lax.scan(
            body,
            (desc, times, floors, ids, count),
            (new_desc, new_times, new_floors, new_ids),
        )
    )
    return desc, times, floors, ids, count, scores, match_ids, jnp.sum(rejected)


def measure_compute_rate(
    capacity: int = 4096,
    dim: int = 4096,
    n_frames: int = 4096,
    top_k: int = 10,
    similarity_threshold: float = 0.5,
    min_time_gap: float = 10.0,
    strict_floor: bool = True,
    reps: int = 3,
    seed: int = 0,
) -> Dict[str, float]:
    """On-chip (compute-only) StreamingGate rate in keyframes/s.

    The serving path's per-keyframe device work is ONE ring-buffer
    retrieval step inside `_stream_step`'s lax.scan — identical whether
    the scan covers a 16-frame micro-batch or all `n_frames` at once
    (the carry is the same ring buffer). So the probe dispatches a
    single `_stream_step` over `n_frames` frames and times it with a
    scalar fetch: the one dispatch+fetch round-trip amortizes to
    ~RTT/n_frames per keyframe, isolating device time from the
    per-micro-batch host round-trips that dominate `bench_stream`'s
    end-to-end number through the TPU tunnel (BENCH_NOTES.md).

    Returns {"keyframes_per_s", "ms_per_keyframe", "elapsed_s"} for the
    best of `reps` timed executions (fresh ring state each rep — the
    step donates its buffers).
    """
    import time

    rng = np.random.default_rng(seed)
    desc = l2_normalize(
        jnp.asarray(rng.normal(size=(n_frames, dim)).astype(np.float32))
    )
    times = jnp.asarray(
        np.arange(n_frames, dtype=np.float32) * (2.0 * min_time_gap)
    )
    floors = jnp.asarray(
        rng.integers(1, 6, size=n_frames).astype(np.int32)
    )
    gids = jnp.arange(n_frames, dtype=jnp.int32)
    jax.block_until_ready((desc, times, floors, gids))

    def run() -> float:
        s = _init_state(capacity, dim)
        out = _stream_step(
            s.desc, s.times, s.floors, s.ids, s.count,
            desc, times, floors, gids,
            k=top_k,
            strict_floor=strict_floor,
            min_time_gap=min_time_gap,
            threshold=similarity_threshold,
        )
        # scalar fetch forces execution (block_until_ready does not block
        # through the tunnel transport)
        return float(jnp.sum(jnp.where(jnp.isfinite(out[5]), out[5], 0.0)))

    run()  # compile warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return {
        "keyframes_per_s": n_frames / best,
        "ms_per_keyframe": 1e3 * best / n_frames,
        "elapsed_s": best,
    }


class StreamingGate:
    """Bounded-latency online gate: call `add_keyframes` per micro-batch.

    Args:
        capacity: ring-buffer size (static; compile-once).
        descriptor_dim: optional D; inferred from the first batch when
            None, enforced (ValueError on mismatch) when given.
        encoder: optional batched image encoder `(B, H, W[, C]) -> (B, D)`
            (e.g. `train/pretrain_vpr.load_encoder()` or any
            `models/` VPR encoder's `encode_batch_device`); when set,
            `add_keyframes` accepts images and encodes on device.
        top_k / similarity_threshold / min_time_gap / strict_floor:
            the offline pipeline's retrieval + gate semantics
            (gating/full_gate.py defaults).
    """

    def __init__(
        self,
        capacity: int = 4096,
        descriptor_dim: Optional[int] = None,
        encoder: Optional[Callable] = None,
        top_k: int = 10,
        similarity_threshold: float = 0.5,
        min_time_gap: float = 10.0,
        strict_floor: bool = True,
    ):
        self.capacity = int(capacity)
        self.dim = None if descriptor_dim is None else int(descriptor_dim)
        self.encoder = encoder
        self.top_k = int(top_k)
        self.threshold = float(similarity_threshold)
        self.min_time_gap = float(min_time_gap)
        self.strict_floor = bool(strict_floor)
        self.state: Optional[StreamingState] = None
        self.stats: Dict[str, int] = {
            "keyframes": 0,
            "accepted_candidates": 0,
            "rejected_cross_floor": 0,
            "evicted": 0,
        }

    def _ensure_state(self, dim: int) -> None:
        if self.dim is not None and int(dim) != self.dim:
            raise ValueError(
                f"descriptor dim mismatch: got {int(dim)}, expected {self.dim}"
            )
        if self.state is None:
            self.dim = int(dim)
            self.state = _init_state(self.capacity, self.dim)

    def add_keyframes(
        self,
        images_or_desc: np.ndarray,  # (M, H, W[, C]) images or (M, D) desc
        timestamps: np.ndarray,  # (M,)
        floor_labels: np.ndarray,  # (M,)
    ) -> StreamingMatches:
        """Process one micro-batch; returns this batch's gated candidates.

        ONE device dispatch (plus one for encoding when an encoder is
        attached). Frame i retrieves against everything inserted before
        it, including earlier frames of the same call.
        """
        x = jnp.asarray(images_or_desc)
        if x.ndim >= 3:
            if self.encoder is None:
                raise ValueError("images given but no encoder attached")
            x = self.encoder(x)
        desc = l2_normalize(x.astype(jnp.float32))
        M = int(desc.shape[0])
        self._ensure_state(desc.shape[1])
        start = self.stats["keyframes"]
        gids = jnp.arange(start, start + M, dtype=jnp.int32)
        s = self.state
        out = _stream_step(
            s.desc, s.times, s.floors, s.ids, s.count,
            desc,
            jnp.asarray(timestamps, jnp.float32),
            jnp.asarray(floor_labels, jnp.int32),
            gids,
            k=self.top_k,
            strict_floor=self.strict_floor,
            min_time_gap=self.min_time_gap,
            threshold=self.threshold,
        )
        self.state = StreamingState(*out[:5])
        scores, match_ids, rejected = (
            np.asarray(out[5]), np.asarray(out[6]), int(out[7])
        )
        self.stats["keyframes"] += M
        self.stats["rejected_cross_floor"] += rejected
        self.stats["accepted_candidates"] += int((match_ids >= 0).sum())
        self.stats["evicted"] = max(
            0, self.stats["keyframes"] - self.capacity
        )
        return StreamingMatches(
            query_ids=np.arange(start, start + M),
            match_ids=match_ids,
            scores=scores,
            cross_floor_rejected=rejected,
        )
