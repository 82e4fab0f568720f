"""Torch->Flax converter tests using synthetic torch-style state dicts."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlis_tpu.models.convert import convert_dinov2_torch, convert_resnet_torch
from mlis_tpu.models.resnet import ResNet, ResNetConfig, init_resnet
from mlis_tpu.models.vit import ViT, ViTConfig, init_vit


def _fake_resnet_sd(rng, cfg: ResNetConfig):
    """torchvision-style state dict with shapes matching models/resnet.py."""
    sd = {}
    w = cfg.width
    sd["conv1.weight"] = rng.normal(size=(w, 3, 7, 7)).astype(np.float32)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = np.abs(rng.normal(size=w)).astype(np.float32)
    in_ch = w
    for stage, n_blocks in enumerate(cfg.stage_sizes[: cfg.crop_stage]):
        feats = w * (2**stage)
        for b in range(n_blocks):
            tp = f"layer{stage + 1}.{b}"
            sd[f"{tp}.conv1.weight"] = rng.normal(size=(feats, in_ch, 1, 1)).astype(np.float32)
            sd[f"{tp}.conv2.weight"] = rng.normal(size=(feats, feats, 3, 3)).astype(np.float32)
            sd[f"{tp}.conv3.weight"] = rng.normal(size=(feats * 4, feats, 1, 1)).astype(np.float32)
            for i, ch in ((1, feats), (2, feats), (3, feats * 4)):
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.bn{i}.{k}"] = np.abs(rng.normal(size=ch)).astype(np.float32)
            if b == 0:
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    size=(feats * 4, in_ch, 1, 1)
                ).astype(np.float32)
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.downsample.1.{k}"] = np.abs(rng.normal(size=feats * 4)).astype(np.float32)
            in_ch = feats * 4
    return sd


def test_resnet_converter_shapes_and_forward(rng):
    cfg = ResNetConfig.tiny_test()
    model, params = init_resnet(cfg, (64, 64))
    sd = _fake_resnet_sd(rng, cfg)
    new = convert_resnet_torch(sd, params["params"])
    out = model.apply({"params": new}, jnp.ones((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out)).all()
    # converted stem kernel must be the transposed torch weight
    np.testing.assert_allclose(
        np.asarray(new["stem_conv"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
        atol=1e-6,
    )


def _fake_dinov2_sd(rng, cfg: ViTConfig):
    d = cfg.dim
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=d).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, cfg.pos_grid**2 + 1, d)).astype(np.float32),
        "norm.weight": rng.normal(size=d).astype(np.float32),
        "norm.bias": rng.normal(size=d).astype(np.float32),
    }
    hidden = int(d * cfg.mlp_ratio)
    for i in range(cfg.depth):
        tp = f"blocks.{i}"
        sd[f"{tp}.norm1.weight"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.norm1.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{tp}.attn.qkv.bias"] = rng.normal(size=3 * d).astype(np.float32)
        sd[f"{tp}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{tp}.attn.proj.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.ls1.gamma"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.norm2.weight"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.norm2.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.mlp.fc1.weight"] = rng.normal(size=(hidden, d)).astype(np.float32)
        sd[f"{tp}.mlp.fc1.bias"] = rng.normal(size=hidden).astype(np.float32)
        sd[f"{tp}.mlp.fc2.weight"] = rng.normal(size=(d, hidden)).astype(np.float32)
        sd[f"{tp}.mlp.fc2.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.ls2.gamma"] = rng.normal(size=d).astype(np.float32)
    return sd


def test_dinov2_converter_forward_and_qkv_layout(rng):
    cfg = ViTConfig.tiny_test()
    model, params = init_vit(cfg, (56, 56))
    sd = _fake_dinov2_sd(rng, cfg)
    new = convert_dinov2_torch(sd, params["params"])
    out = model.apply({"params": new}, jnp.ones((1, 56, 56, 3)))
    assert np.isfinite(np.asarray(out["cls"])).all()
    # torch Linear does x @ W.T; flax kernel must equal W.T
    np.testing.assert_allclose(
        np.asarray(new["block0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].T,
        atol=1e-6,
    )


def test_converter_rejects_shape_mismatch(rng):
    cfg = ViTConfig.tiny_test()
    _, params = init_vit(cfg, (56, 56))
    sd = _fake_dinov2_sd(rng, cfg)
    sd["cls_token"] = np.zeros((1, 1, 128), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_dinov2_torch(sd, params["params"])


def test_converter_accepts_torch_tensors(rng):
    torch = pytest.importorskip("torch")
    cfg = ViTConfig.tiny_test()
    _, params = init_vit(cfg, (56, 56))
    sd = {k: torch.from_numpy(v) for k, v in _fake_dinov2_sd(rng, cfg).items()}
    new = convert_dinov2_torch(sd, params["params"])
    assert new["cls_token"].shape == (1, 1, cfg.dim)


def test_superpoint_converter(rng):
    from mlis_tpu.models.convert import convert_superpoint_torch
    from mlis_tpu.models.superpoint import SuperPoint, SuperPointConfig

    sp = SuperPoint(SuperPointConfig())  # full-size channel plan
    params = sp.init_params((64, 64))

    chans = [(1, 64), (64, 64), (64, 64), (64, 64), (64, 128), (128, 128),
             (128, 128), (128, 128)]
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b"]
    sd = {}
    for (cin, cout), nm in zip(chans, names):
        sd[f"{nm}.weight"] = rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)
        sd[f"{nm}.bias"] = rng.normal(size=cout).astype(np.float32)
    sd["convPa.weight"] = rng.normal(size=(256, 128, 3, 3)).astype(np.float32)
    sd["convPa.bias"] = rng.normal(size=256).astype(np.float32)
    sd["convPb.weight"] = rng.normal(size=(65, 256, 1, 1)).astype(np.float32)
    sd["convPb.bias"] = rng.normal(size=65).astype(np.float32)
    sd["convDa.weight"] = rng.normal(size=(256, 128, 3, 3)).astype(np.float32)
    sd["convDa.bias"] = rng.normal(size=256).astype(np.float32)
    sd["convDb.weight"] = rng.normal(size=(256, 256, 1, 1)).astype(np.float32)
    sd["convDb.bias"] = rng.normal(size=256).astype(np.float32)

    new = convert_superpoint_torch(sd, params["params"])
    sp.params = {"params": new}
    import jax.numpy as jnp

    kp = sp.detect(jnp.ones((1, 64, 64, 1)) * 0.5)
    assert np.isfinite(np.asarray(kp.scores)).all()


def test_lightglue_converter(rng):
    from mlis_tpu.models.convert import convert_lightglue_torch
    from mlis_tpu.models.lightglue import LightGlue, MatcherConfig
    from mlis_tpu.models.superpoint import SuperPointConfig

    cfg = MatcherConfig.tiny_test()  # d=32, depth=2
    lg = LightGlue(
        sp_cfg=SuperPointConfig.tiny_test(max_keypoints=16),
        matcher_cfg=cfg,
    )
    lg._init(16, 16, (64, 64))
    template = lg.params["params"]
    d = cfg.dim

    sd = {
        "input_proj.weight": rng.normal(size=(d, cfg.descriptor_dim)).astype(np.float32),
        "input_proj.bias": rng.normal(size=d).astype(np.float32),
        "posenc.Wr.weight": rng.normal(size=(d // cfg.num_heads // 2, 2)).astype(np.float32),
    }
    for i in range(cfg.depth):
        tp = f"transformers.{i}"
        sd[f"{tp}.self_attn.Wqkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{tp}.self_attn.Wqkv.bias"] = rng.normal(size=3 * d).astype(np.float32)
        sd[f"{tp}.self_attn.out_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{tp}.self_attn.out_proj.bias"] = rng.normal(size=d).astype(np.float32)
        for blk in ("self_attn", "cross_attn"):
            sd[f"{tp}.{blk}.ffn.0.weight"] = rng.normal(size=(2 * d, 2 * d)).astype(np.float32)
            sd[f"{tp}.{blk}.ffn.0.bias"] = rng.normal(size=2 * d).astype(np.float32)
            sd[f"{tp}.{blk}.ffn.1.weight"] = rng.normal(size=2 * d).astype(np.float32)
            sd[f"{tp}.{blk}.ffn.1.bias"] = rng.normal(size=2 * d).astype(np.float32)
            sd[f"{tp}.{blk}.ffn.3.weight"] = rng.normal(size=(d, 2 * d)).astype(np.float32)
            sd[f"{tp}.{blk}.ffn.3.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.cross_attn.to_qk.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{tp}.cross_attn.to_qk.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.cross_attn.to_v.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{tp}.cross_attn.to_v.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{tp}.cross_attn.to_out.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{tp}.cross_attn.to_out.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"log_assignment.{i}.final_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"log_assignment.{i}.final_proj.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"log_assignment.{i}.matchability.weight"] = rng.normal(size=(1, d)).astype(np.float32)
        sd[f"log_assignment.{i}.matchability.bias"] = rng.normal(size=1).astype(np.float32)

    new = convert_lightglue_torch(sd, template)
    # per-depth stacking and qkv split layout
    assert new["blocks"]["self"]["q"]["kernel"].shape == (cfg.depth, d, d)
    np.testing.assert_allclose(
        new["blocks"]["self"]["q"]["kernel"][0],
        sd["transformers.0.self_attn.Wqkv.weight"].T[:, :d],
        atol=1e-6,
    )
    # cross attention shares to_qk between our q and k
    np.testing.assert_allclose(
        new["blocks"]["cross"]["q"]["kernel"], new["blocks"]["cross"]["k"]["kernel"]
    )
    # loaded params run end-to-end
    lg.params = {"params": new}
    lg._jit_match = {}
    import jax.numpy as jnp
    from mlis_tpu.ops.image import to_grayscale

    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    g = to_grayscale(jnp.asarray(img)[None])
    kp0, kp1, matches = lg.match_batch(g, g)
    assert np.isfinite(np.asarray(matches.scores)).all()
