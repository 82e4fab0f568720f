"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mlis_tpu.models.vit import ViT, ViTConfig
from mlis_tpu.ops.pooling import gem_pool
from mlis_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)
from mlis_tpu.train.trainer import VPRTrainer, make_train_step, nt_xent_loss


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(-1, 1)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(3, 2)


def test_param_shardings_tp_rules():
    mesh = make_mesh(4, 2)
    cfg = ViTConfig(dim=64, depth=1, num_heads=2, pos_grid=8)
    model = ViT(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    sh = param_shardings(mesh, params)
    block = sh["params"]["block0"]
    # column-parallel qkv: output dim sharded over model axis
    assert block["attn"]["qkv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, MODEL_AXIS
    )
    # row-parallel proj
    assert block["attn"]["proj"]["kernel"].spec == jax.sharding.PartitionSpec(
        MODEL_AXIS, None
    )
    # biases replicated
    assert block["attn"]["qkv"]["bias"].spec == jax.sharding.PartitionSpec()


def test_sharded_forward_matches_single_device(rng):
    cfg = ViTConfig(dim=64, depth=2, num_heads=2, pos_grid=8)
    model = ViT(cfg, use_pallas=False)
    x = jnp.asarray(rng.normal(size=(8, 28, 28, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])

    ref = model.apply(params, x)["cls"]

    mesh = make_mesh(4, 2)
    p_sh = param_shardings(mesh, params)
    params_s = jax.device_put(params, p_sh)
    x_s = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(lambda p, xx: model.apply(p, xx)["cls"])(params_s, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_nt_xent_loss_behavior(rng):
    d = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    ids_match = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    loss = float(nt_xent_loss(d, ids_match))
    assert np.isfinite(loss) and loss > 0
    # identical positives -> lower loss than random positives
    d2 = jnp.concatenate([d[:4], d[:4]], axis=0)
    ids2 = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3])
    assert float(nt_xent_loss(d2, ids2)) < loss


def test_vpr_trainer_end_to_end(rng):
    cfg = ViTConfig(dim=64, depth=1, num_heads=2, pos_grid=8)
    model = ViT(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))

    def apply_fn(p, x):
        out = model.apply(p, x)
        d = gem_pool(out["patches"], p=3.0)
        return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    trainer = VPRTrainer(apply_fn, params, n_data=4, n_model=2)
    imgs = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    ids = np.arange(8) // 2
    losses = [trainer.train_batch(imgs, ids) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert trainer.step == 3
    # training on a fixed batch should reduce the loss
    for _ in range(5):
        losses.append(trainer.train_batch(imgs, ids))
    assert losses[-1] < losses[0]


def test_trainer_checkpoint_roundtrip(rng, tmp_path):
    cfg = ViTConfig(dim=32, depth=1, num_heads=2, pos_grid=8)
    model = ViT(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))

    def apply_fn(p, x):
        out = model.apply(p, x)
        return gem_pool(out["patches"], p=3.0)

    trainer = VPRTrainer(apply_fn, params, n_data=8, n_model=1)
    imgs = rng.normal(size=(8, 28, 28, 3)).astype(np.float32)
    trainer.train_batch(imgs, np.arange(8) // 2)
    trainer.save_checkpoint(str(tmp_path / "ckpt"))

    trainer2 = VPRTrainer(apply_fn, params, n_data=8, n_model=1)
    trainer2.load_checkpoint(str(tmp_path / "ckpt"))
    assert trainer2.step == trainer.step
    a = jax.tree_util.tree_leaves(trainer.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(8, 1)
    batch = {"x": np.zeros((16, 4)), "y": np.zeros(16)}
    out = shard_batch(mesh, batch)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
