"""Mesh exercises at realistic shapes (8-device virtual CPU mesh).

Round-2 verdict: the TP `param_shardings` layout and the sharded gate had
only ever run on a dim-64 toy with a pixel-downsample encoder. These
tests run (a) a full-width ViT-B block stack (dim 768, 12 heads, fc 3072)
through the Megatron TP layout with a forward/backward train step, checked
against the single-device loss, and (b) the multi-chip gate with a real
`models/` ViT encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.models.vit import ViT, ViTConfig
from mlis_tpu.ops.pooling import gem_pool
from mlis_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)


def _vitb_width_cfg():
    # full ViT-B width; depth 2 bounds CPU test time (the TP layout is
    # per-block, so two blocks exercise every sharded kernel shape)
    return ViTConfig(dim=768, depth=2, num_heads=12, pos_grid=8)


def _apply_fn(model):
    def apply_fn(p, x):
        out = model.apply(p, x)
        d = gem_pool(out["patches"], p=3.0)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    return apply_fn


@pytest.mark.slow
def test_vitb_width_tp_layout_and_train_step():
    import optax

    from mlis_tpu.train.trainer import make_train_step

    cfg = _vitb_width_cfg()
    model = ViT(cfg, use_pallas=False)
    images = np.random.default_rng(0).normal(
        size=(8, 28, 28, 3)
    ).astype(np.float32)
    place_ids = np.arange(8) // 2
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:1]))

    mesh = make_mesh(4, 2)
    p_shard = param_shardings(mesh, params)

    # the Megatron rules must actually fire on the full-width kernels:
    # qkv/fc1 column-parallel, proj/fc2 row-parallel
    specs = jax.tree_util.tree_map(lambda s: s.spec, p_shard)
    b0 = specs["params"]["block0"]
    assert b0["attn"]["qkv"]["kernel"] == jax.sharding.PartitionSpec(
        None, MODEL_AXIS
    )
    assert b0["attn"]["proj"]["kernel"] == jax.sharding.PartitionSpec(
        MODEL_AXIS, None
    )
    assert b0["mlp"]["fc1"]["kernel"] == jax.sharding.PartitionSpec(
        None, MODEL_AXIS
    )
    assert b0["mlp"]["fc2"]["kernel"] == jax.sharding.PartitionSpec(
        MODEL_AXIS, None
    )

    optimizer = optax.adamw(1e-4)
    step = make_train_step(_apply_fn(model), optimizer)
    sharded_params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(sharded_params)
    b_shard = batch_sharding(mesh)
    im = jax.device_put(jnp.asarray(images), b_shard)
    ids = jax.device_put(jnp.asarray(place_ids, jnp.int32), b_shard)
    jit_step = jax.jit(
        step,
        in_shardings=(p_shard, None, b_shard, b_shard),
        out_shardings=(p_shard, None, replicated(mesh)),
    )
    new_params, _, loss = jit_step(sharded_params, opt_state, im, ids)
    loss = float(loss)
    assert np.isfinite(loss)

    # sharding preserved through the update
    qkv = new_params["params"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)

    # DP+TP loss matches the single-device computation (bf16 tolerance)
    from mlis_tpu.train.trainer import nt_xent_loss

    ref_loss = float(
        nt_xent_loss(
            _apply_fn(model)(params, jnp.asarray(images)),
            jnp.asarray(place_ids, jnp.int32),
        )
    )
    assert abs(loss - ref_loss) < 2e-2 * max(1.0, abs(ref_loss))


@pytest.mark.slow
def test_sharded_gate_with_vit_encoder(rng):
    """The multi-chip gate driven by a real models/ ViT encoder (not a
    pixel downsample), checked against the same encoder single-device."""
    from mlis_tpu.gating.full_gate import FullGatePipeline
    from mlis_tpu.gating.verification import GeometricVerifier
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig
    from mlis_tpu.parallel.sharded_gate import sharded_full_gate_step
    from types import SimpleNamespace

    n = 16
    bases = [
        np.kron(
            rng.integers(0, 255, (15, 20, 3), dtype=np.uint8),
            np.ones((8, 8, 1), np.uint8),
        )[:120, :160]
        for _ in range(4)
    ]
    images = np.stack([bases[i % 4] for i in range(n)])
    times = np.arange(n) * 30.0
    floors = np.asarray([5] * 8 + [2] * 8)
    K_cam = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])

    vit_cfg = ViTConfig(dim=64, depth=2, num_heads=2, pos_grid=8, patch_size=8)
    vit = ViT(vit_cfg, use_pallas=False)
    vit_params = vit.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 120, 160, 3), jnp.float32)
    )

    def encode_fn(imgs):
        x = imgs.astype(jnp.float32) / 255.0
        out = vit.apply(vit_params, x)
        d = gem_pool(out["patches"], p=3.0)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=64),
        matcher_cfg=MatcherConfig.tiny_test(),
    )
    mesh = make_mesh(-1, 1)
    verdicts, stats = sharded_full_gate_step(
        mesh, lg, encode_fn, images, times, floors, K_cam,
        top_k=5, threshold=0.8, min_time_gap=10.0, per_device_budget=4,
    )
    assert stats["total"] > 0
    assert stats["dropped"] == 0

    # single-chip pipeline with the same encoder agrees on the pair set
    spr = SimpleNamespace(vpr=SimpleNamespace(encode_batch_device=encode_fn))
    pipe = FullGatePipeline(
        vpr=spr,
        verifier=GeometricVerifier(matcher=lg),
        top_k=5,
        similarity_threshold=0.8,
        min_time_gap=10.0,
        strict_floor=True,
    )
    res = pipe.process(images, times, floors, K_cam)
    ok = verdicts["slot_valid"]
    undirected = {
        (min(q, m), max(q, m))
        for q, m in zip(verdicts["qi"][ok], verdicts["mi"][ok])
    }
    assert undirected == {(r.query_idx, r.match_idx) for r in res.results}
