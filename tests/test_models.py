import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.models.resnet import ResNet, ResNetConfig, init_resnet
from mlis_tpu.models.vit import ViT, ViTConfig, init_vit
from mlis_tpu.ops.attention import fused_attention, multi_head_attention
from mlis_tpu.ops.pooling import (
    cross_correlation_score,
    gem_pool,
    vlad_aggregate,
)
from mlis_tpu.ops.sinkhorn import sinkhorn_log, sinkhorn_with_dustbin


# ---------------- attention ----------------


def test_fused_attention_matches_reference(rng):
    q = jnp.asarray(rng.normal(size=(4, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(4, 48, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(4, 48, 16)), jnp.float32)
    ref = fused_attention(q, k, v, use_pallas=False)
    pal = fused_attention(q, k, v, use_pallas=True)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5)


def test_fused_attention_with_bias_mask(rng):
    q = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
    bias = jnp.zeros((2, 8, 12)).at[:, :, 6:].set(-1e30)  # mask tail keys
    out = fused_attention(q, k, v, bias, use_pallas=True)
    ref = fused_attention(q, k, v, bias, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # masked keys must not contribute: recompute with truncated k/v
    ref_trunc = fused_attention(q, k[:, :6], v[:, :6], use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_trunc), atol=2e-5)


def test_multi_head_attention_shapes(rng):
    q = jnp.asarray(rng.normal(size=(2, 10, 4, 8)), jnp.float32)
    out = multi_head_attention(q, q, q, use_pallas=False)
    assert out.shape == (2, 10, 4, 8)


# ---------------- ViT ----------------


def test_vit_forward_shapes():
    cfg = ViTConfig.tiny_test()
    model, params = init_vit(cfg, (56, 56))  # 4x4 grid of patch 14
    out = model.apply(params, jnp.zeros((3, 56, 56, 3)))
    assert out["cls"].shape == (3, 64)
    assert out["patches"].shape == (3, 16, 64)
    assert out["grid"] == (4, 4)


def test_vit_pos_embed_interpolation():
    cfg = ViTConfig.tiny_test()
    model, params = init_vit(cfg, (56, 56))
    # same params, different input size: pos table resized on the fly
    out = model.apply(params, jnp.zeros((1, 112, 84, 3)))
    assert out["patches"].shape == (1, 8 * 6, 64)


def test_vit_register_tokens():
    cfg = ViTConfig.tiny_test(num_register_tokens=4)
    model, params = init_vit(cfg, (56, 56))
    out = model.apply(params, jnp.zeros((1, 56, 56, 3)))
    assert out["registers"].shape == (1, 4, 64)
    assert out["patches"].shape == (1, 16, 64)


# ---------------- ResNet ----------------


def test_resnet_tiny_shapes():
    cfg = ResNetConfig.tiny_test()
    model, params = init_resnet(cfg, (64, 64))
    feat = model.apply(params, jnp.zeros((2, 64, 64, 3)))
    # stem /4, stage2 stride 2 -> /8; width 8 * 2 * 4 = 64 channels
    assert feat.shape == (2, 8, 8, 64)


def test_resnet50_config_structure():
    cfg = ResNetConfig.resnet50(crop_stage=3)
    assert cfg.stage_sizes == (3, 4, 6, 3)


# ---------------- pooling / aggregation ----------------


def test_gem_pool_reduces_to_mean_for_p1(rng):
    x = jnp.asarray(np.abs(rng.normal(size=(2, 10, 8))) + 0.1)
    np.testing.assert_allclose(
        np.asarray(gem_pool(x, p=1.0)), np.asarray(jnp.mean(x, axis=1)), rtol=1e-5
    )


def test_gem_pool_p3_known_value():
    x = jnp.ones((1, 5, 4)) * 2.0
    np.testing.assert_allclose(np.asarray(gem_pool(x, p=3.0)), 2.0, rtol=1e-5)


def test_vlad_aggregate_properties(rng):
    x = jnp.asarray(rng.normal(size=(2, 50, 16)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    v = vlad_aggregate(x, c)
    assert v.shape == (2, 8 * 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0, rtol=1e-5)


def test_vlad_matches_naive(rng):
    x = rng.normal(size=(1, 30, 8)).astype(np.float32)
    c = rng.normal(size=(4, 8)).astype(np.float32)
    got = np.asarray(vlad_aggregate(jnp.asarray(x), jnp.asarray(c)))[0]

    # naive VLAD
    assign = np.argmin(((x[0][:, None] - c[None]) ** 2).sum(-1), axis=1)
    vlad = np.zeros((4, 8), np.float32)
    for i, a in enumerate(assign):
        vlad[a] += x[0][i] - c[a]
    vlad /= np.linalg.norm(vlad, axis=1, keepdims=True) + 1e-12
    flat = vlad.reshape(-1)
    flat /= np.linalg.norm(flat) + 1e-12
    np.testing.assert_allclose(got, flat, atol=1e-5)


def test_cross_correlation_score_identical_images(rng):
    p = jnp.asarray(rng.normal(size=(20, 16)), jnp.float32)
    s_same = float(cross_correlation_score(p, p))
    q = jnp.asarray(rng.normal(size=(20, 16)), jnp.float32)
    s_diff = float(cross_correlation_score(p, q))
    assert s_same == pytest.approx(1.0, abs=1e-5)
    assert s_diff < s_same


# ---------------- sinkhorn ----------------


def test_sinkhorn_log_marginals(rng):
    s = jnp.asarray(rng.normal(size=(3, 10, 12)), jnp.float32)
    log_p = sinkhorn_log(s, num_iters=50)
    p = np.asarray(jnp.exp(log_p))
    np.testing.assert_allclose(p.sum(axis=2), 1.0 / 10, atol=1e-4)
    np.testing.assert_allclose(p.sum(axis=1), 1.0 / 12, atol=1e-4)


def test_sinkhorn_dustbin_shapes_and_mass(rng):
    s = jnp.asarray(rng.normal(size=(2, 6, 9)), jnp.float32)
    out = sinkhorn_with_dustbin(s, jnp.asarray(0.5), num_iters=30)
    assert out.shape == (2, 7, 10)
    p = np.asarray(jnp.exp(out))
    # each real row's mass (including dustbin) ~ 1
    np.testing.assert_allclose(p[:, :6, :].sum(axis=2), 1.0, atol=1e-3)


def test_vit_remat_matches_forward_and_grads(rng):
    cfg = ViTConfig.tiny_test()
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    m_plain = ViT(cfg, use_pallas=False)
    m_remat = ViT(cfg, use_pallas=False, remat=True)
    params = m_plain.init(jax.random.PRNGKey(0), x)

    out_p = m_plain.apply(params, x)["cls"]
    out_r = m_remat.apply(params, x)["cls"]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=1e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x)["cls"].astype(jnp.float32) ** 2)

    g_p = jax.grad(loss(m_plain))(params)
    g_r = jax.grad(loss(m_remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_matcher_checkpoints_are_self_describing(tmp_path):
    """save_weights npzs carry their architecture in their shapes:
    matcher_arch_from_npz must recover (depth, dim, heads) so bench.py /
    eval/quality.py can rebuild a matching model for ANY shipped variant
    (e.g. a depth-pruned throughput checkpoint) without metadata."""
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig
    from mlis_tpu.models.weights import matcher_arch_from_npz

    cfg = MatcherConfig(
        descriptor_dim=32, dim=48, num_heads=2, depth=3
    )
    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=32),
        matcher_cfg=cfg,
    )
    hw = (64, 96)
    lg.sp.init_params(hw)
    lg._init(32, 32, hw)
    path = str(tmp_path / "m.npz")
    lg.save_weights(path)

    arch = matcher_arch_from_npz(path)
    assert arch == {
        "descriptor_dim": 32, "dim": 48, "depth": 3, "num_heads": 2
    }

    # a model rebuilt from the inferred arch loads the checkpoint cleanly
    lg2 = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=32),
        matcher_cfg=MatcherConfig(**arch),
    )
    lg2.load_weights(path, image_hw=hw)
