import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.ops.attention import _reference_attention
from mlis_tpu.ops.flash_attention import flash_attention, flash_mha


def test_flash_matches_reference(rng):
    q = jnp.asarray(rng.normal(size=(2, 300, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 600, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 600, 32)), jnp.float32)
    out = flash_attention(q, k, v, block_q=128)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_kv_length_masking(rng):
    q = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 512, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 512, 16)), jnp.float32)
    kv_len = jnp.asarray([100, 512], jnp.int32)
    out = flash_attention(q, k, v, kv_len, block_q=64)
    # row 0 must equal attention over only the first 100 keys
    ref0 = _reference_attention(q[:1], k[:1, :100], v[:1, :100])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0[0]), atol=3e-5)
    ref1 = _reference_attention(q[1:], k[1:], v[1:])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref1[0]), atol=3e-5)


def test_flash_handles_nonmultiple_shapes(rng):
    q = jnp.asarray(rng.normal(size=(1, 130, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 70, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 70, 16)), jnp.float32)
    out = flash_attention(q, k, v, block_q=64)
    assert out.shape == (1, 130, 16)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_mha_prefix_mask(rng):
    B, S, H, Dh = 2, 40, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, Dh)), jnp.float32)
    row1 = np.concatenate([np.ones(25), np.zeros(15)])
    kv_valid = jnp.asarray(np.stack([np.ones(S), row1]), bool)
    out = flash_mha(q, q, q, kv_valid=kv_valid)
    assert out.shape == (B, S, H, Dh)
    # batch 1 ignores keys >= 25
    q1 = q[1:, :, :, :]
    ref = flash_mha(q1[:, :, :, :], q1[:, :25], q1[:, :25])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[0]), atol=3e-5)


def test_flash_zero_length_rows_are_finite(rng):
    q = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    out = flash_attention(q, k, k, jnp.asarray([0], jnp.int32), block_q=16)
    assert np.isfinite(np.asarray(out)).all()
