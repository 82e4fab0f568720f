"""Torch->Flax converter tests using synthetic torch-style state dicts.

Weight-fidelity strategy (zero-egress environment): for every converter we
assert ACTIVATION parity between a torch implementation of the official
architecture and the converted Flax forward, on official-layout state
dicts with random values. When a real checkpoint is present on disk
(MLIS_WEIGHTS_DIR, default ~/.cache/mlis_tpu/weights), the same harness
runs against the actual pretrained weights; otherwise those tests skip.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from mlis_tpu.models.convert import convert_dinov2_torch, convert_resnet_torch
from mlis_tpu.models.resnet import ResNet, ResNetConfig, init_resnet
from mlis_tpu.models.vit import ViT, ViTConfig, init_vit


WEIGHTS_DIR = Path(
    os.environ.get(
        "MLIS_WEIGHTS_DIR", os.path.expanduser("~/.cache/mlis_tpu/weights")
    )
)


def _real_ckpt(name: str):
    """Load a real checkpoint if present, else skip the calling test."""
    p = WEIGHTS_DIR / name
    if not p.exists():
        pytest.skip(f"real checkpoint not on disk: {p}")
    torch = pytest.importorskip("torch")
    return torch.load(p, map_location="cpu", weights_only=False)


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


# ---------------------------------------------------------------------------
# LoFTR official-architecture converter + activation parity vs torch oracle
# ---------------------------------------------------------------------------


def _randomize_torch_state(sd, rng, scale=1.0):
    """Fill an official-layout state dict with bounded random values
    (kaiming-scaled weights so deep activations stay O(1))."""
    import torch

    out = {}
    for k, v in sd.items():
        shape = tuple(v.shape)
        if "running_var" in k:
            arr = rng.uniform(0.5, 1.5, shape)
        elif "running_mean" in k or "num_batches" in k:
            arr = rng.normal(size=shape) * 0.1 if shape else np.zeros(shape)
        elif v.ndim == 1 and k.endswith("weight"):
            arr = rng.uniform(0.5, 1.5, shape)  # BN / LayerNorm scale
        elif v.ndim == 1:
            arr = rng.normal(size=shape) * 0.1  # biases
        else:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(size=shape) * (2.0 / fan_in) ** 0.5 * scale
        out[k] = torch.from_numpy(np.asarray(arr, np.float32).reshape(shape))
    return out


def _loftr_pair(rng, thr=1e-6):
    """Build matched torch-oracle + flax-official LoFTR tiny models.

    Weights are kaiming-scaled at 0.5x so the dual-softmax confidences stay
    in a well-conditioned range (unit scale drives them subnormal, where
    torch/XLA denormal handling diverges)."""
    import torch

    from loftr_torch_ref import LoFTRTorch
    from mlis_tpu.models.loftr import LoFTR, LoFTRConfig

    cfg = LoFTRConfig.official_tiny(dtype=jnp.float32, match_threshold=thr)
    tm = LoFTRTorch(
        initial_dim=cfg.initial_dim,
        block_dims=cfg.block_dims,
        d_coarse=cfg.coarse_dim,
        d_fine=cfg.fine_dim,
        nhead=cfg.num_heads,
        depth=cfg.depth,
        window=cfg.fine_window,
        temp_bug_fix=cfg.temp_bug_fix,
    )
    tm.load_state_dict(_randomize_torch_state(tm.state_dict(), rng, scale=0.5))
    tm.eval()
    fm = LoFTR(cfg)
    fm.load_torch_state_dict(tm.state_dict())
    return tm, fm, cfg


def test_loftr_converter_stage_parity(rng):
    """Backbone + coarse transformer + conf matrix + fine stage all match
    the torch oracle on an official-shaped random state dict."""
    torch = pytest.importorskip("torch")
    from mlis_tpu.models.loftr import OfficialLoFTRNet

    tm, fm, cfg = _loftr_pair(rng)
    im = rng.uniform(0, 1, (1, 2, 64, 64)).astype(np.float32)
    t_im0 = torch.from_numpy(im[:, :1])
    t_im1 = torch.from_numpy(im[:, 1:])

    tt0, tt1, tf0, tf1, (hc, wc) = tm.forward_coarse(t_im0, t_im1)
    j_im0 = jnp.asarray(im[:, 0, :, :, None])
    j_im1 = jnp.asarray(im[:, 1, :, :, None])
    jt0, jt1, jf0, jf1, _ = OfficialLoFTRNet(cfg).apply(
        {"params": fm.params["params"]["coarse"]}, j_im0, j_im1
    )
    # coarse transformer outputs (the deepest shared stage)
    np.testing.assert_allclose(np.asarray(jt0), tt0.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jt1), tt1.numpy(), atol=2e-4, rtol=1e-3)
    # fine backbone maps (flax channel-last)
    np.testing.assert_allclose(
        np.asarray(jf0), tf0.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )

    # confidence matrix parity
    tconf = tm.conf_matrix(tt0, tt1).numpy()
    d = cfg.coarse_dim
    a = np.asarray(jt0) / d**0.5
    b = np.asarray(jt1) / d**0.5
    sim = np.einsum("bnd,bmd->bnm", a, b) / cfg.temperature
    ex = np.exp(sim - sim.max(axis=2, keepdims=True))
    p2 = ex / ex.sum(axis=2, keepdims=True)
    ex1 = np.exp(sim - sim.max(axis=1, keepdims=True))
    p1 = ex1 / ex1.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(p2 * p1, tconf, atol=1e-5, rtol=1e-3)


def test_loftr_converter_end_to_end_matches(rng):
    """Full flax matcher reproduces the torch oracle's mutual-max match set
    and spatial-expectation refinement."""
    torch = pytest.importorskip("torch")

    tm, fm, cfg = _loftr_pair(rng)
    im = rng.uniform(0, 1, (1, 2, 64, 64)).astype(np.float32)
    t_im0 = torch.from_numpy(im[:, :1])
    t_im1 = torch.from_numpy(im[:, 1:])

    # torch oracle end-to-end (selection logic mirrored in-test)
    tt0, tt1, tf0, tf1, (hc, wc) = tm.forward_coarse(t_im0, t_im1)
    conf = tm.conf_matrix(tt0, tt1)[0].numpy()
    xs, ys = np.arange(hc * wc) % wc, np.arange(hc * wc) // wc
    interior = (
        (xs >= cfg.border_rm) & (xs < wc - cfg.border_rm)
        & (ys >= cfg.border_rm) & (ys < hc - cfg.border_rm)
    )
    conf = conf * interior[:, None] * interior[None, :]
    best1 = conf.argmax(1)
    best0 = conf.argmax(0)
    mutual = best0[best1] == np.arange(hc * wc)
    cvals = conf[np.arange(hc * wc), best1]
    sel = np.nonzero(mutual & (cvals > cfg.match_threshold))[0]
    t_matches = {}
    if len(sel):
        b_ids = torch.zeros(len(sel), dtype=torch.long)
        i_ids = torch.from_numpy(sel)
        j_ids = torch.from_numpy(best1[sel])
        _, _, coords = tm.forward_fine(tf0, tf1, tt0, tt1, b_ids, i_ids, j_ids)
        coords = coords.numpy()
        for n, (i, j) in enumerate(zip(sel, best1[sel])):
            k1 = np.array([(j % wc) * 8.0, (j // wc) * 8.0]) + coords[n] * (
                cfg.fine_window // 2
            ) * 2.0
            t_matches[(i % wc, i // wc)] = (k1, cvals[i])

    m = fm.match_batch(
        jnp.asarray(im[:, 0, :, :, None]), jnp.asarray(im[:, 1, :, :, None])
    )
    valid = np.asarray(m.valid[0])
    k0 = np.asarray(m.kpts0[0])[valid]
    k1 = np.asarray(m.kpts1[0])[valid]
    sc = np.asarray(m.scores[0])[valid]
    assert len(k0) == len(t_matches) > 0
    for n in range(len(k0)):
        cell = (int(k0[n, 0] // 8), int(k0[n, 1] // 8))
        assert cell in t_matches
        tk1, tconf_v = t_matches[cell]
        np.testing.assert_allclose(k1[n], tk1, atol=5e-3)
        np.testing.assert_allclose(sc[n], tconf_v, atol=1e-5, rtol=1e-3)


def test_loftr_converter_full_dims_template():
    """convert_loftr_torch consumes a FULL-dims official state dict
    (256/128, depth 4) including 'matcher.'-prefixed lightning layout."""
    torch = pytest.importorskip("torch")
    from loftr_torch_ref import LoFTRTorch
    from mlis_tpu.models.loftr import LoFTR, LoFTRConfig

    tm = LoFTRTorch()  # full official dims
    sd = {f"matcher.{k}": v for k, v in tm.state_dict().items()}
    cfg = LoFTRConfig.official_full(max_matches=128)
    fm = LoFTR(cfg)
    fm.load_torch_state_dict({"state_dict": sd}, shape=(64, 64))
    assert fm.params["params"]["coarse"]["coarse_self3"]["q_proj"][
        "kernel"
    ].shape == (256, 256)


# ---------------------------------------------------------------------------
# Real-checkpoint parity (skipped unless weights are on disk)
# ---------------------------------------------------------------------------


def test_real_loftr_checkpoint_parity(rng):
    """With a real indoor/outdoor-ds ckpt on disk, assert activation parity
    between the torch oracle and the converted flax model."""
    torch = pytest.importorskip("torch")
    ckpt = _real_ckpt("loftr_indoor_ds.ckpt")
    from loftr_torch_ref import LoFTRTorch
    from mlis_tpu.models.loftr import LoFTR, LoFTRConfig, OfficialLoFTRNet

    sd = ckpt.get("state_dict", ckpt)
    sd = {k[len("matcher.") :] if k.startswith("matcher.") else k: v
          for k, v in sd.items()}
    tm = LoFTRTorch()
    tm.load_state_dict(sd, strict=False)
    tm.eval()
    cfg = LoFTRConfig.official_full(dtype=jnp.float32)
    fm = LoFTR(cfg)
    fm.load_torch_state_dict(sd)

    im = rng.uniform(0, 1, (1, 2, 128, 128)).astype(np.float32)
    tt0, tt1, _, _, _ = tm.forward_coarse(
        torch.from_numpy(im[:, :1]), torch.from_numpy(im[:, 1:])
    )
    jt0, jt1, _, _, _ = OfficialLoFTRNet(cfg).apply(
        {"params": fm.params["params"]["coarse"]},
        jnp.asarray(im[:, 0, :, :, None]),
        jnp.asarray(im[:, 1, :, :, None]),
    )
    cos = np.sum(np.asarray(jt0) * tt0.numpy()) / (
        np.linalg.norm(np.asarray(jt0)) * np.linalg.norm(tt0.numpy()) + 1e-9
    )
    assert cos > 0.999


def test_real_superpoint_checkpoint(rng):
    """Real SuperPoint weights convert and produce sane detections."""
    sd = _real_ckpt("superpoint_v1.pth")
    from mlis_tpu.models.convert import convert_superpoint_torch
    from mlis_tpu.models.superpoint import SuperPoint, SuperPointConfig

    sp = SuperPoint(SuperPointConfig())
    params = sp.init_params((128, 128))
    sp.params = {"params": convert_superpoint_torch(sd, params["params"])}
    img = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 1)).astype(np.float32))
    kp = sp.detect(img)
    assert np.isfinite(np.asarray(kp.scores)).all()


def test_real_resnet50_checkpoint(rng):
    """Real torchvision ResNet-50 weights convert through the template."""
    sd = _real_ckpt("resnet50.pth")
    from mlis_tpu.models.resnet import ResNetConfig, init_resnet

    model, params = init_resnet(ResNetConfig.resnet50(), (64, 64))
    new = convert_resnet_torch(sd, params["params"])
    out = model.apply({"params": new}, jnp.ones((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out)).all()
