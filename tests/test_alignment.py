import numpy as np
import pytest

from mlis_tpu.eval.alignment import (
    align_se3,
    align_sim3,
    apply_sim3,
    kabsch_sim3_legacy,
    umeyama,
)


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


@pytest.mark.parametrize("scale_true", [1.0, 0.32, 3.12])
def test_umeyama_recovers_known_transform(rng, scale_true):
    R_true = _random_rotation(rng)
    t_true = rng.normal(size=3) * 10
    src = rng.normal(size=(200, 3)) * 5
    tgt = scale_true * src @ R_true.T + t_true

    s, R, t = umeyama(src, tgt, with_scale=True)
    np.testing.assert_allclose(s, scale_true, rtol=1e-9)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(apply_sim3(src, s, R, t), tgt, atol=1e-8)


def test_umeyama_se3_mode_fixes_scale(rng):
    R_true = _random_rotation(rng)
    src = rng.normal(size=(100, 3))
    tgt = 2.0 * src @ R_true.T  # scaled target but SE3 alignment
    s, R, t = umeyama(src, tgt, with_scale=False)
    assert s == 1.0
    np.testing.assert_allclose(R, R_true, atol=1e-9)


def test_umeyama_reflection_correction(rng):
    # A reflected target must still yield a proper rotation (det +1)
    src = rng.normal(size=(50, 3))
    tgt = src.copy()
    tgt[:, 2] *= -1
    s, R, t = umeyama(src, tgt)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)


def test_umeyama_jax_backend_matches_numpy(rng):
    import jax.numpy as jnp

    src = rng.normal(size=(80, 3))
    R_true = _random_rotation(rng)
    tgt = 1.7 * src @ R_true.T + 3.0
    s_np, R_np, t_np = umeyama(src, tgt)
    s_j, R_j, t_j = umeyama(jnp.asarray(src), jnp.asarray(tgt), xp=jnp)
    # float32 on device vs float64 on host
    np.testing.assert_allclose(np.asarray(s_j), s_np, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R_j), R_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_j), t_np, atol=1e-3)


def test_legacy_kabsch_matches_reference_impl(rng):
    """Bit-level parity with the reference final_eval.py:60-92 algorithm."""

    def reference_align_sim3(est, ref):
        est_c = np.mean(est, axis=0)
        ref_c = np.mean(ref, axis=0)
        est_centered = est - est_c
        ref_centered = ref - ref_c
        H = est_centered.T @ ref_centered
        U, _, Vt = np.linalg.svd(H)
        R = Vt.T @ U.T
        if np.linalg.det(R) < 0:
            Vt[-1, :] *= -1
            R = Vt.T @ U.T
        est_rot = (R @ est_centered.T).T
        scale = np.sum(ref_centered * est_rot) / (np.sum(est_rot * est_rot) + 1e-10)
        t = ref_c - scale * R @ est_c
        return scale * (R @ est.T).T + t, scale

    for _ in range(5):
        est = rng.normal(size=(120, 3)) * 3
        ref = rng.normal(size=(120, 3)) * 3
        want_aligned, want_scale = reference_align_sim3(est, ref)
        got_aligned, got_scale = kabsch_sim3_legacy(est, ref)
        np.testing.assert_allclose(got_aligned, want_aligned, atol=1e-10)
        np.testing.assert_allclose(got_scale, want_scale, rtol=1e-12)


def test_align_wrappers(rng):
    src = rng.normal(size=(60, 3))
    R_true = _random_rotation(rng)
    tgt = src @ R_true.T + 1.0
    aligned, R, t = align_se3(src, tgt)
    np.testing.assert_allclose(aligned, tgt, atol=1e-8)
    aligned2, s, R2, t2 = align_sim3(src * 4, tgt)
    np.testing.assert_allclose(aligned2, tgt, atol=1e-8)
    assert s == pytest.approx(0.25)
