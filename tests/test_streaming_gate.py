"""Online streaming gate (gating/streaming.py).

Decision parity with the offline retrieval+gate path, sequential-arrival
semantics (a frame only matches the PAST), ring-buffer eviction, and
the compile-once contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.gating.gate import gate_mask
from mlis_tpu.gating.streaming import StreamingGate
from mlis_tpu.ops.knn import cosine_topk, l2_normalize


def _scene(n=40, dim=16, n_places=8, seed=0):
    """Descriptors clustered by place; floors alternate so some revisits
    are cross-floor traps."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_places, dim))
    place = rng.integers(0, n_places, size=n)
    desc = centers[place] + 0.05 * rng.normal(size=(n, dim))
    times = np.arange(n) * 6.0
    floors = (place % 2 + 1) * 2 + rng.integers(0, 2, size=n)  # mixed
    return desc.astype(np.float32), times.astype(np.float32), floors.astype(np.int32)


def _offline_pairs(desc, times, floors, k, threshold, min_time_gap,
                   strict=True):
    """Reference decisions, per query against its PAST-only database:
    top-k over gap-masked similarities (cosine_topk on desc[:q] — the
    same bf16 GEMM numerics as streaming), then threshold, then the
    floor gate on the surviving top-k — the offline full_gate order."""
    n = len(desc)
    pairs = set()
    for q in range(1, n):
        scores, idx = cosine_topk(
            jnp.asarray(desc[q : q + 1]), jnp.asarray(desc[:q]),
            jnp.asarray(times[q : q + 1]), jnp.asarray(times[:q]),
            k=min(k, q), min_time_gap=min_time_gap,
        )
        scores, idx = np.asarray(scores)[0], np.asarray(idx)[0]
        for j in range(len(scores)):
            if np.isfinite(scores[j]) and scores[j] >= threshold:
                m = int(idx[j])
                ok = bool(
                    np.asarray(
                        gate_mask(
                            jnp.asarray(floors),
                            jnp.asarray([q]),
                            jnp.asarray([m]),
                            strict,
                        )
                    )[0]
                )
                if ok:
                    pairs.add((q, m))
    return pairs


def test_streaming_matches_offline_decisions():
    desc, times, floors = _scene()
    # SMALL top-k on purpose: cross-floor candidates must rank inside the
    # top-k (consuming slots, then gated) for parity to be meaningful
    sg = StreamingGate(
        capacity=64, top_k=3, similarity_threshold=0.8, min_time_gap=10.0
    )
    got = set()
    for s in range(0, len(desc), 8):  # micro-batches of 8
        out = sg.add_keyframes(desc[s : s + 8], times[s : s + 8], floors[s : s + 8])
        got.update((q, m) for q, m, _ in out.pairs())
    want = _offline_pairs(desc, times, floors, 3, 0.8, 10.0)
    assert got == want
    assert sg.stats["keyframes"] == len(desc)
    assert sg.stats["accepted_candidates"] == len(got)


def test_gated_candidate_consumes_its_topk_slot():
    # the code-review repro: with top_k=1, a HIGHER-scoring cross-floor
    # candidate must consume the single slot and be gated — NOT cede the
    # slot to the lower-scoring same-floor candidate (offline semantics)
    rng = np.random.default_rng(3)
    q = rng.normal(size=8).astype(np.float32)
    q /= np.linalg.norm(q)
    perp = rng.normal(size=8).astype(np.float32)
    perp -= q * (perp @ q)
    perp /= np.linalg.norm(perp)
    a = 0.90 * q + np.sqrt(1 - 0.90**2) * perp  # same floor, sim 0.90
    b = 0.95 * q + np.sqrt(1 - 0.95**2) * perp  # cross floor, sim 0.95
    desc = np.stack([a, b, q])
    floors = np.array([2, 3, 2])
    times = np.array([0.0, 20.0, 40.0], np.float32)
    sg = StreamingGate(capacity=8, top_k=1, similarity_threshold=0.5,
                       min_time_gap=10.0)
    out = sg.add_keyframes(desc, times, floors)
    assert out.pairs() == []  # slot went to b, which the gate rejected
    # 2 rejections: query q's slot went to b (cross-floor), and frame b
    # itself saw frame a across floors
    assert out.cross_floor_rejected == 2
    # same decision as the offline composition
    assert _offline_pairs(desc, times, floors, 1, 0.5, 10.0) == set()


def test_streaming_within_batch_retrieval():
    # frame 3 of one call must see frame 0 of the SAME call (12 s apart)
    d = np.array(l2_normalize(jnp.asarray(np.eye(4, 8, dtype=np.float32) + 1.0)))
    d[3] = d[0]  # identical descriptor, 18 s later
    sg = StreamingGate(capacity=16, top_k=4, similarity_threshold=0.9,
                       min_time_gap=10.0)
    out = sg.add_keyframes(d, np.arange(4) * 6.0, np.full(4, 2))
    assert (3, 0) in {(q, m) for q, m, _ in out.pairs()}


def test_streaming_gate_rejects_cross_floor():
    d = np.eye(4, 8, dtype=np.float32)
    d[2] = d[0]  # revisit of frame 0 ...
    floors = np.array([2, 2, 5, 2])  # ... but on another floor
    sg = StreamingGate(capacity=8, top_k=4, similarity_threshold=0.9,
                       min_time_gap=10.0)
    out = sg.add_keyframes(d, np.arange(4) * 12.0, floors)
    assert out.cross_floor_rejected >= 1
    assert all(m != 0 for q, m, _ in out.pairs() if q == 2)
    # loose mode admits a one-floor difference
    sg2 = StreamingGate(capacity=8, top_k=4, similarity_threshold=0.9,
                        min_time_gap=10.0, strict_floor=False)
    floors2 = np.array([4, 4, 5, 4])
    out2 = sg2.add_keyframes(d, np.arange(4) * 12.0, floors2)
    assert (2, 0) in {(q, m) for q, m, _ in out2.pairs()}


def test_ring_buffer_eviction():
    # capacity 8, 24 frames: the oldest 16 are evicted; a revisit of an
    # evicted frame finds nothing, a revisit of a live one does
    rng = np.random.default_rng(1)
    d = rng.normal(size=(24, 8)).astype(np.float32)
    d[20] = d[2]  # revisit of an EVICTED frame (2 < 24-8)
    d[21] = d[17]  # revisit of a LIVE frame
    times = np.arange(24) * 20.0
    floors = np.full(24, 3)
    sg = StreamingGate(capacity=8, top_k=8, similarity_threshold=0.95,
                       min_time_gap=10.0)
    pairs = set()
    for s in range(0, 24, 4):
        out = sg.add_keyframes(d[s : s + 4], times[s : s + 4], floors[s : s + 4])
        pairs.update((q, m) for q, m, _ in out.pairs())
    assert (21, 17) in pairs
    assert all(m != 2 for q, m, _s in [(p[0], p[1], 0) for p in pairs] if q == 20)
    assert sg.stats["evicted"] == 16


def test_streaming_compiles_once_per_batch_shape():
    sg = StreamingGate(capacity=32, top_k=4, similarity_threshold=0.5)
    d = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    t = np.arange(4) * 20.0
    f = np.full(4, 2)
    sg.add_keyframes(d, t, f)
    from mlis_tpu.gating.streaming import _stream_step

    n0 = _stream_step._cache_size()
    for i in range(1, 5):
        sg.add_keyframes(d + i, t + 100.0 * i, f)
    assert _stream_step._cache_size() == n0  # no recompiles


def test_compute_rate_beats_20hz_camera():
    # the serving-rate contract: per-keyframe device time must keep up
    # with the NUFR camera rate (20 Hz, reference bag_utils.py:55-65)
    # with margin. The probe is memory-bound (one ring-buffer sweep per
    # frame), so the CPU tier pins a 1024-entry ring at the production
    # descriptor dim (16 MB/frame sweep); the chip bench JSON reports
    # the full 4096-cap production shape (~1 ms/frame on v5e — a
    # real-time factor of ~50 vs the camera).
    from mlis_tpu.gating.streaming import measure_compute_rate

    out = measure_compute_rate(
        capacity=1024, dim=4096, n_frames=128, reps=1
    )
    assert out["keyframes_per_s"] >= 20.0, out
    assert out["ms_per_keyframe"] > 0.0


def test_streaming_with_encoder():
    # images in, candidates out: encoder runs inside the same pipeline
    def enc(imgs):
        x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
        return x[:, :16]

    rng = np.random.default_rng(2)
    imgs = rng.uniform(size=(6, 8, 8)).astype(np.float32)
    imgs[5] = imgs[0]
    sg = StreamingGate(capacity=16, encoder=enc, top_k=4,
                       similarity_threshold=0.99, min_time_gap=10.0)
    out = sg.add_keyframes(imgs, np.arange(6) * 12.0, np.full(6, 2))
    assert (5, 0) in {(q, m) for q, m, _ in out.pairs()}
