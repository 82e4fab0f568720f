import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.ops.knn import cosine_topk, l2_normalize, loop_closure_topk, pairwise_similarity


def _np_reference_topk(desc, times, k, gap, threshold=None):
    """Reference loop semantics (place_recognition.py:873-886)."""
    dn = desc / (np.linalg.norm(desc, axis=1, keepdims=True) + 1e-8)
    sims = dn @ dn.T
    out = []
    for i in range(len(desc)):
        s = sims[i].copy()
        s[np.abs(times - times[i]) < gap] = -np.inf
        top = np.argsort(s)[::-1][:k]
        out.append([(j, s[j]) for j in top if np.isfinite(s[j])])
    return out


def test_pairwise_similarity_matches_numpy(rng):
    d = rng.normal(size=(37, 16)).astype(np.float32)
    got = np.asarray(pairwise_similarity(jnp.asarray(d), chunk=16, compute_dtype=jnp.float32))
    dn = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, dn @ dn.T, atol=1e-5)


def test_cosine_topk_matches_reference_loop(rng):
    n, dim, k = 60, 32, 5
    desc = rng.normal(size=(n, dim)).astype(np.float32)
    times = np.sort(rng.uniform(0, 600, n)).astype(np.float32)
    scores, idx = cosine_topk(
        jnp.asarray(desc),
        jnp.asarray(desc),
        jnp.asarray(times),
        jnp.asarray(times),
        k=k,
        min_time_gap=10.0,
        chunk=16,
        compute_dtype=jnp.float32,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    want = _np_reference_topk(desc, times, k, 10.0)
    for i in range(n):
        got_pairs = [(j, s) for j, s in zip(idx[i], scores[i]) if np.isfinite(s)]
        assert len(got_pairs) == len(want[i])
        for (gj, gs), (wj, ws) in zip(got_pairs, want[i]):
            assert gj == wj
            assert gs == pytest.approx(ws, abs=1e-4)


def test_cosine_topk_masks_temporal_neighbors(rng):
    desc = rng.normal(size=(20, 8)).astype(np.float32)
    times = np.arange(20.0)
    scores, idx = cosine_topk(
        jnp.asarray(desc), jnp.asarray(desc),
        jnp.asarray(times), jnp.asarray(times),
        k=20, min_time_gap=5.0, compute_dtype=jnp.float32,
    )
    for i in range(20):
        for s, j in zip(np.asarray(scores[i]), np.asarray(idx[i])):
            if np.isfinite(s):
                assert abs(times[j] - times[i]) >= 5.0


def test_loop_closure_topk_self_masked(rng):
    desc = rng.normal(size=(15, 8)).astype(np.float32)
    times = np.arange(15.0) * 100
    scores, idx = loop_closure_topk(jnp.asarray(desc), jnp.asarray(times), k=3)
    for i in range(15):
        assert i not in idx[i][np.isfinite(scores[i])]


def test_l2_normalize_eps_convention(rng):
    x = jnp.zeros((2, 4))
    out = np.asarray(l2_normalize(x))
    assert np.all(np.isfinite(out))
