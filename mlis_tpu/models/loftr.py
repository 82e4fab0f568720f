"""LoFTR: detector-free coarse-to-fine dense matching, batched for TPU.

Reference slot (geometric_verification.py:424-526): kornia LoFTR with
resize-to-multiple-of-8 and keypoint rescaling. TPU re-design:
  * conv backbone yields coarse (1/8) and fine (1/2) feature maps;
  * the coarse transformer uses linear (kernelized) attention — the actual
    LoFTR formulation — which is O(N d^2) matmuls, MXU-friendly, and avoids
    materializing the (Hc*Wc)^2 score matrix;
  * coarse matching is dual-softmax + mutual-max, then a static top-M
    selection replaces dynamic thresholding;
  * fine refinement gathers a 5x5 window around each coarse match in the
    fine map of image2 and soft-argmaxes the correlation with the center
    feature of image1 — one batched gather + GEMM.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.gating.verification import BaseFeatureMatcher
from mlis_tpu.models.resnet import FrozenBatchNorm
from mlis_tpu.ops.image import to_grayscale


@dataclasses.dataclass(frozen=True)
class LoFTRConfig:
    coarse_dim: int = 128
    fine_dim: int = 64
    depth: int = 4
    num_heads: int = 4
    temperature: float = 0.1
    match_threshold: float = 0.2
    max_matches: int = 1024
    fine_window: int = 5
    dtype: Any = jnp.bfloat16
    # --- official-architecture mode (kornia / zju3dv LoFTR, the reference's
    # actual pretrained model, geometric_verification.py:424-460) ---
    official: bool = False
    initial_dim: int = 128
    block_dims: Tuple[int, ...] = (128, 196, 256)
    # the released indoor/outdoor weights were trained with the pos-encoding
    # div-term precedence bug (upstream keeps it under temp_bug_fix=False)
    temp_bug_fix: bool = False
    border_rm: int = 2

    @staticmethod
    def tiny_test(**kw) -> "LoFTRConfig":
        kw.setdefault("coarse_dim", 32)
        kw.setdefault("fine_dim", 16)
        kw.setdefault("depth", 1)
        kw.setdefault("num_heads", 2)
        kw.setdefault("max_matches", 64)
        return LoFTRConfig(**kw)

    @staticmethod
    def official_full(**kw) -> "LoFTRConfig":
        """The released indoor/outdoor-ds configuration (d_model 256)."""
        kw.setdefault("coarse_dim", 256)
        kw.setdefault("fine_dim", 128)
        kw.setdefault("depth", 4)
        kw.setdefault("num_heads", 8)
        return LoFTRConfig(official=True, **kw)

    @staticmethod
    def official_tiny(**kw) -> "LoFTRConfig":
        """Official structure at test-size dims (for converter tests)."""
        kw.setdefault("coarse_dim", 32)
        kw.setdefault("fine_dim", 16)
        kw.setdefault("depth", 1)
        kw.setdefault("num_heads", 2)
        kw.setdefault("max_matches", 64)
        kw.setdefault("initial_dim", 16)
        kw.setdefault("block_dims", (16, 24, 32))
        return LoFTRConfig(official=True, **kw)


class DenseMatches(NamedTuple):
    kpts0: jnp.ndarray  # (B, M, 2) xy pixels in image0
    kpts1: jnp.ndarray  # (B, M, 2) refined xy pixels in image1
    scores: jnp.ndarray  # (B, M)
    valid: jnp.ndarray  # (B, M)


def _conv_block(x, ch, dtype, name, stride=1):
    x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME", dtype=dtype, name=name)(x)
    return nn.relu(x)


class LoFTRBackbone(nn.Module):
    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 1)
        c = self.cfg
        x = images.astype(c.dtype)
        x1 = _conv_block(x, 32, c.dtype, "c1a")
        x1 = _conv_block(x1, 32, c.dtype, "c1b", stride=2)  # /2
        fine = nn.Conv(c.fine_dim, (3, 3), padding="SAME", dtype=c.dtype, name="fine_out")(x1)
        x2 = _conv_block(x1, 64, c.dtype, "c2", stride=2)  # /4
        x3 = _conv_block(x2, 128, c.dtype, "c3", stride=2)  # /8
        coarse = nn.Conv(c.coarse_dim, (3, 3), padding="SAME", dtype=c.dtype, name="coarse_out")(x3)
        return coarse, fine


def linear_attention(q, k, v):
    """Kernelized attention: phi(q) (phi(k)^T v) with phi = elu + 1.
    q: (B, S, H, Dh), k/v: (B, T, H, Dh)."""
    qf = jax.nn.elu(q.astype(jnp.float32)) + 1.0
    kf = jax.nn.elu(k.astype(jnp.float32)) + 1.0
    kv = jnp.einsum("bthd,bthe->bhde", kf, v.astype(jnp.float32))
    z = 1.0 / (jnp.einsum("bshd,bhd->bsh", qf, kf.sum(axis=1)) + 1e-6)
    out = jnp.einsum("bshd,bhde,bsh->bshe", qf, kv, z)
    return out


class LinearAttnLayer(nn.Module):
    dim: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, source):
        B, S, _ = x.shape
        T = source.shape[1]
        Dh = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(B, S, self.num_heads, Dh)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(source).reshape(B, T, self.num_heads, Dh)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(source).reshape(B, T, self.num_heads, Dh)
        msg = linear_attention(q, k, v).reshape(B, S, self.dim).astype(self.dtype)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return x + h


class LoFTRNet(nn.Module):
    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images0, images1):
        c = self.cfg
        backbone = LoFTRBackbone(c, name="backbone")
        c0, f0 = backbone(images0)
        c1, f1 = backbone(images1)
        B, hc, wc, D = c0.shape
        t0 = c0.reshape(B, hc * wc, D)
        t1 = c1.reshape(B, hc * wc, D)
        for i in range(c.depth):
            t0 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"self{i}_0")(t0, t0)
            t1 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"self{i}_1")(t1, t1)
            t0n = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"cross{i}_0")(t0, t1)
            t1 = LinearAttnLayer(c.coarse_dim, c.num_heads, c.dtype, name=f"cross{i}_1")(t1, t0)
            t0 = t0n
        return t0, t1, f0, f1, (hc, wc)


# ---------------------------------------------------------------------------
# Official architecture (kornia / zju3dv LoFTR) — weight-compatible modules.
#
# The reference's actual matcher is kornia's pretrained LoFTR
# (geometric_verification.py:424-460, indoor dual-softmax weights). These
# modules reproduce the official forward exactly (torch-parity tested in
# tests/test_convert.py against a torch re-implementation), so a real
# checkpoint converted with models/convert.convert_loftr_torch gives the
# reference's match distribution on TPU.
# ---------------------------------------------------------------------------


def _pconv(x, ch, k, s, name, dtype):
    """Conv with torch-style explicit padding (torch pads (k-1)//2 on both
    sides; flax 'SAME' pads asymmetrically at stride 2, which diverges)."""
    p = (k - 1) // 2
    return nn.Conv(
        ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
        use_bias=False, dtype=dtype, name=name,
    )(x)


class _FPNBasicBlock(nn.Module):
    planes: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        y = _pconv(x, self.planes, 3, self.stride, "conv1", self.dtype)
        y = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(y))
        y = FrozenBatchNorm(self.planes, name="bn2")(
            _pconv(y, self.planes, 3, 1, "conv2", self.dtype)
        )
        if self.stride != 1:
            x = FrozenBatchNorm(self.planes, name="downsample_bn")(
                _pconv(x, self.planes, 1, self.stride, "downsample_conv", self.dtype)
            )
        return nn.relu(x + y)


def _upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with torch align_corners=True semantics
    (jax.image.resize only offers half-pixel-center sampling)."""
    B, H, W, C = x.shape
    x = x.astype(jnp.float32)

    def plan(n):
        out = 2 * n
        src = np.arange(out) * ((n - 1) / (out - 1)) if out > 1 else np.zeros(1)
        lo = np.floor(src).astype(np.int32)
        hi = np.minimum(lo + 1, n - 1)
        t = (src - lo).astype(np.float32)
        return lo, hi, t

    ly, hy, ty = plan(H)
    rows = x[:, ly] * (1.0 - ty)[None, :, None, None] + x[:, hy] * ty[None, :, None, None]
    lx, hx, tx = plan(W)
    return rows[:, :, lx] * (1.0 - tx)[None, None, :, None] + rows[:, :, hx] * tx[None, None, :, None]


class ResNetFPN82(nn.Module):
    """Official ResNetFPN_8_2 backbone: coarse 1/8 + fine 1/2 feature maps."""

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 1) in [0, 1]
        c = self.cfg
        dt = c.dtype
        d0, d1, d2 = c.block_dims
        x = images.astype(dt)
        x0 = nn.Conv(
            c.initial_dim, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=dt, name="conv1",
        )(x)
        x0 = nn.relu(FrozenBatchNorm(c.initial_dim, name="bn1")(x0))
        x1 = _FPNBasicBlock(d0, 1, dt, name="layer1_0")(x0)
        x1 = _FPNBasicBlock(d0, 1, dt, name="layer1_1")(x1)  # 1/2
        x2 = _FPNBasicBlock(d1, 2, dt, name="layer2_0")(x1)
        x2 = _FPNBasicBlock(d1, 1, dt, name="layer2_1")(x2)  # 1/4
        x3 = _FPNBasicBlock(d2, 2, dt, name="layer3_0")(x2)
        x3 = _FPNBasicBlock(d2, 1, dt, name="layer3_1")(x3)  # 1/8

        x3_out = nn.Conv(d2, (1, 1), use_bias=False, dtype=dt, name="layer3_outconv")(x3)
        h = nn.Conv(d2, (1, 1), use_bias=False, dtype=dt, name="layer2_outconv")(x2)
        h = h + _upsample2x_align_corners(x3_out).astype(h.dtype)
        h = _pconv(h, d2, 3, 1, "layer2_outconv2_0", dt)
        h = nn.leaky_relu(FrozenBatchNorm(d2, name="layer2_outconv2_bn")(h))
        x2_out = _pconv(h, d1, 3, 1, "layer2_outconv2_1", dt)

        h = nn.Conv(d1, (1, 1), use_bias=False, dtype=dt, name="layer1_outconv")(x1)
        h = h + _upsample2x_align_corners(x2_out).astype(h.dtype)
        h = _pconv(h, d1, 3, 1, "layer1_outconv2_0", dt)
        h = nn.leaky_relu(FrozenBatchNorm(d1, name="layer1_outconv2_bn")(h))
        x1_out = _pconv(h, d0, 3, 1, "layer1_outconv2_1", dt)
        return x3_out, x1_out  # coarse (1/8, d2), fine (1/2, d0)


def sine_pos_encoding(d_model: int, h: int, w: int, temp_bug_fix: bool) -> np.ndarray:
    """Official PositionEncodingSine, channel-last (h, w, d_model).

    The released checkpoints were trained with the div-term operator-
    precedence bug: `-log(1e4) / d_model // 2` floor-divides AFTER the
    division, i.e. exp(arange * -1.0) for any d_model >= 10.
    """
    pe = np.zeros((d_model, h, w), np.float32)
    y_pos = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_pos = np.cumsum(np.ones((h, w), np.float32), axis=1)
    ar = np.arange(0, d_model // 2, 2, dtype=np.float32)
    if temp_bug_fix:
        div = np.exp(ar * (-math.log(10000.0) / (d_model // 2)))
    else:
        div = np.exp(ar * (-math.log(10000.0) / d_model // 2))
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos[None] * div)
    pe[1::4] = np.cos(x_pos[None] * div)
    pe[2::4] = np.sin(y_pos[None] * div)
    pe[3::4] = np.cos(y_pos[None] * div)
    return pe.transpose(1, 2, 0)


class OfficialEncoderLayer(nn.Module):
    """Official LoFTREncoderLayer: bias-free projections, post-attention
    LayerNorm, ReLU MLP over [x || message]."""

    dim: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, source):
        B, S, _ = x.shape
        T = source.shape[1]
        Dh = self.dim // self.num_heads
        dn = lambda n, d: nn.Dense(d, use_bias=False, dtype=self.dtype, name=n)
        q = dn("q_proj", self.dim)(x).reshape(B, S, self.num_heads, Dh)
        k = dn("k_proj", self.dim)(source).reshape(B, T, self.num_heads, Dh)
        v = dn("v_proj", self.dim)(source).reshape(B, T, self.num_heads, Dh)
        msg = linear_attention(q, k, v).reshape(B, S, self.dim).astype(self.dtype)
        msg = dn("merge", self.dim)(msg)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            msg.astype(jnp.float32)
        ).astype(self.dtype)
        h = jnp.concatenate([x, msg], axis=-1)
        h = dn("mlp0", 2 * self.dim)(h)
        h = nn.relu(h)
        h = dn("mlp2", self.dim)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            h.astype(jnp.float32)
        ).astype(self.dtype)
        return x + h


class OfficialLoFTRNet(nn.Module):
    """Backbone + positional encoding + coarse transformer (official order:
    self layers run per-stream with SHARED weights — batched as one concat —
    and the cross update of stream 1 sees the ALREADY-UPDATED stream 0)."""

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images0, images1):
        c = self.cfg
        both = jnp.concatenate([images0, images1], axis=0)
        coarse, fine = ResNetFPN82(c, name="backbone")(both)
        B = images0.shape[0]
        hc, wc = coarse.shape[1], coarse.shape[2]
        pe = jnp.asarray(sine_pos_encoding(c.coarse_dim, hc, wc, c.temp_bug_fix))
        coarse = (coarse.astype(jnp.float32) + pe[None]).astype(c.dtype)
        t = coarse.reshape(2 * B, hc * wc, c.coarse_dim)
        t0, t1 = t[:B], t[B:]
        for i in range(c.depth):
            self_l = OfficialEncoderLayer(
                c.coarse_dim, c.num_heads, c.dtype, name=f"coarse_self{i}"
            )
            cross_l = OfficialEncoderLayer(
                c.coarse_dim, c.num_heads, c.dtype, name=f"coarse_cross{i}"
            )
            cat = jnp.concatenate([t0, t1], axis=0)
            cat = self_l(cat, cat)
            t0, t1 = cat[:B], cat[B:]
            t0 = cross_l(t0, t1)
            t1 = cross_l(t1, t0)
        return t0, t1, fine[:B], fine[B:], (hc, wc)


class OfficialFineModule(nn.Module):
    """FinePreprocess (coarse-feature concat) + fine transformer.

    windows0/1: (B, M, W*W, fine_dim) gathered fine-map patches;
    cfeat0/1: (B, M, coarse_dim) coarse features at the matched cells.
    """

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, windows0, windows1, cfeat0, cfeat1):
        c = self.cfg
        B, M, WW, Df = windows0.shape
        dt = c.dtype
        # official fine_preprocess: down-project coarse feats, concat to every
        # window position, merge back to fine_dim (both streams in one batch)
        w = jnp.concatenate([windows0, windows1], axis=0).astype(dt)
        cf = jnp.concatenate([cfeat0, cfeat1], axis=0).astype(dt)
        cf = nn.Dense(Df, dtype=dt, name="down_proj")(cf)
        cf = jnp.broadcast_to(cf[:, :, None, :], (2 * B, M, WW, Df))
        w = nn.Dense(Df, dtype=dt, name="merge_feat")(
            jnp.concatenate([w, cf], axis=-1)
        )
        # fine transformer: one self + one cross layer over each window
        # (sequences of length WW; each (b, m) window is independent)
        w = w.reshape(2 * B * M, WW, Df)
        f0, f1 = w[: B * M], w[B * M :]
        self_l = OfficialEncoderLayer(Df, c.num_heads, dt, name="fine_self0")
        cross_l = OfficialEncoderLayer(Df, c.num_heads, dt, name="fine_cross0")
        cat = jnp.concatenate([f0, f1], axis=0)
        cat = self_l(cat, cat)
        f0, f1 = cat[: B * M], cat[B * M :]
        f0 = cross_l(f0, f1)
        f1 = cross_l(f1, f0)
        return f0.reshape(B, M, WW, Df), f1.reshape(B, M, WW, Df)


def gather_fine_windows(f, cx, cy, window: int, stride: int = 4):
    """Zero-padded WxW fine-map windows centered at (stride*cx, stride*cy)
    — exactly F.unfold(kernel=W, stride=4, padding=W//2) at coarse cells.

    f: (B, hf, wf, D); cx/cy: (B, M) int coarse coords. -> (B, M, W*W, D)
    """
    B, hf, wf, D = f.shape
    r = window // 2
    offs = np.arange(-r, r + 1)
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    ox = jnp.asarray(ox.reshape(-1))
    oy = jnp.asarray(oy.reshape(-1))
    gx = cx[..., None] * stride + ox[None, None]
    gy = cy[..., None] * stride + oy[None, None]
    inb = (gx >= 0) & (gx < wf) & (gy >= 0) & (gy < hf)
    gxc = jnp.clip(gx, 0, wf - 1).astype(jnp.int32)
    gyc = jnp.clip(gy, 0, hf - 1).astype(jnp.int32)
    pat = jax.vmap(lambda fm, yy, xx: fm[yy, xx])(f, gyc, gxc)
    return pat * inb[..., None].astype(pat.dtype)


def fine_spatial_expectation(f0_win, f1_win, window: int):
    """Official FineMatching: correlate the CENTER feature of window0 with
    window1, softmax at 1/sqrt(C), spatial expectation on the [-1,1]
    normalized grid. Returns (B, M, 2) offsets in [-1, 1]."""
    B, M, WW, C = f0_win.shape
    center = f0_win[:, :, WW // 2, :].astype(jnp.float32)
    sim = jnp.einsum("bmc,bmrc->bmr", center, f1_win.astype(jnp.float32))
    heat = jax.nn.softmax(sim / (C**0.5), axis=-1)
    lin = np.linspace(-1.0, 1.0, window, dtype=np.float32)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    ex = jnp.sum(heat * jnp.asarray(gx.reshape(-1))[None, None], axis=-1)
    ey = jnp.sum(heat * jnp.asarray(gy.reshape(-1))[None, None], axis=-1)
    return jnp.stack([ex, ey], axis=-1)


def coarse_match(t0, t1, temperature, threshold, max_matches,
                 normalize: str = "l2", grid_hw=None, border_rm: int = 0):
    """Dual-softmax mutual matching over coarse grids -> static top-M.

    normalize='l2' (lite path) or 'sqrt_dim' (official: feats / d**0.5).
    border_rm zeroes confidences within `border_rm` cells of the grid edge
    on either image (official mask_border)."""
    if normalize == "sqrt_dim":
        d = t0.shape[-1]
        n0 = t0.astype(jnp.float32) / (d**0.5)
        n1 = t1.astype(jnp.float32) / (d**0.5)
    else:
        n0 = t0 / (jnp.linalg.norm(t0.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
        n1 = t1 / (jnp.linalg.norm(t1.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("bnd,bmd->bnm", n0.astype(jnp.float32), n1.astype(jnp.float32))
    sim = sim / temperature
    p = jax.nn.softmax(sim, axis=2) * jax.nn.softmax(sim, axis=1)
    if border_rm > 0 and grid_hw is not None:
        hc, wc = grid_hw
        xs = np.arange(hc * wc) % wc
        ys = np.arange(hc * wc) // wc
        interior = (
            (xs >= border_rm) & (xs < wc - border_rm)
            & (ys >= border_rm) & (ys < hc - border_rm)
        )
        m = jnp.asarray(interior, p.dtype)
        p = p * m[None, :, None] * m[None, None, :]
    best1 = jnp.argmax(p, axis=2)  # (B, N)
    best0 = jnp.argmax(p, axis=1)  # (B, M)
    n_idx = jnp.arange(p.shape[1])
    mutual = jnp.take_along_axis(best0, best1, axis=1) == n_idx[None]
    conf = jnp.take_along_axis(p, best1[..., None], axis=2)[..., 0]
    conf = jnp.where(mutual & (conf > threshold), conf, 0.0)
    scores, sel = jax.lax.top_k(conf, min(max_matches, conf.shape[1]))  # (B, M)
    idx1 = jnp.take_along_axis(best1, sel, axis=1)
    return sel, idx1, scores, scores > 0


def fine_refine(f1, coarse_xy1, center_feat0, window: int, scale: int):
    """Refine image-1 positions: correlate f0 center feature against a
    window x window fine-map patch around each coarse location; soft-argmax.

    f1: (B, hf, wf, D); coarse_xy1: (B, M, 2) in fine-grid coords;
    center_feat0: (B, M, D). Returns refined (B, M, 2) in fine-grid coords.
    """
    B, hf, wf, D = f1.shape
    r = window // 2
    offs = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)
    oy = oy.reshape(-1)  # (W2,)

    gx = jnp.clip(coarse_xy1[..., 0, None] + ox[None, None], 0, wf - 1)
    gy = jnp.clip(coarse_xy1[..., 1, None] + oy[None, None], 0, hf - 1)

    def per_image(fm, gx_, gy_):
        return fm[gy_.astype(jnp.int32), gx_.astype(jnp.int32)]  # (M, W2, D)

    patches = jax.vmap(per_image)(f1.astype(jnp.float32), gx, gy)
    corr = jnp.einsum("bmwd,bmd->bmw", patches, center_feat0.astype(jnp.float32))
    w = jax.nn.softmax(corr / (D**0.5), axis=-1)
    dx = jnp.sum(w * ox[None, None], axis=-1)
    dy = jnp.sum(w * oy[None, None], axis=-1)
    return coarse_xy1 + jnp.stack([dx, dy], axis=-1)


class OfficialLoFTRMatcher(nn.Module):
    """Full official forward: coarse transformer -> dual-softmax matching ->
    fine preprocess/transformer -> spatial-expectation refinement."""

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, images0, images1) -> "DenseMatches":
        c = self.cfg
        t0, t1, f0, f1, (hc, wc) = OfficialLoFTRNet(c, name="coarse")(
            images0, images1
        )
        sel0, sel1, scores, valid = coarse_match(
            t0, t1, c.temperature, c.match_threshold, c.max_matches,
            normalize="sqrt_dim", grid_hw=(hc, wc), border_rm=c.border_rm,
        )
        x0 = (sel0 % wc).astype(jnp.int32)
        y0 = (sel0 // wc).astype(jnp.int32)
        x1 = (sel1 % wc).astype(jnp.int32)
        y1 = (sel1 // wc).astype(jnp.int32)
        w0 = gather_fine_windows(f0, x0, y0, c.fine_window)
        w1 = gather_fine_windows(f1, x1, y1, c.fine_window)
        cf0 = jnp.take_along_axis(t0, sel0[..., None], axis=1)
        cf1 = jnp.take_along_axis(t1, sel1[..., None], axis=1)
        fw0, fw1 = OfficialFineModule(c, name="fine")(w0, w1, cf0, cf1)
        off = fine_spatial_expectation(fw0, fw1, c.fine_window)
        # coarse cells -> input pixels at scale 8 (no center offset, official
        # grid convention); fine offset: [-1,1] * (W//2) fine px * stride 2
        kpts0 = jnp.stack([x0 * 8.0, y0 * 8.0], axis=-1)
        kpts1 = (
            jnp.stack([x1 * 8.0, y1 * 8.0], axis=-1)
            + off * float(c.fine_window // 2) * 2.0
        )
        return DenseMatches(kpts0, kpts1, scores, valid)


class LoFTR(BaseFeatureMatcher):
    """Batched dense matcher with the reference's resize/rescale contract."""

    # match_batch returns DenseMatches (already-paired points), not
    # (Keypoints, Keypoints, Matches) — GeometricVerifier.verify_pairs_batch
    # dispatches on this
    dense_matcher = True

    def __init__(self, cfg: Optional[LoFTRConfig] = None, seed: int = 0):
        self.cfg = cfg or LoFTRConfig()
        self.net = (
            OfficialLoFTRMatcher(self.cfg) if self.cfg.official
            else LoFTRNet(self.cfg)
        )
        self.params = None
        self._seed = seed
        self._jit = {}

    def load_torch_state_dict(self, state_dict, shape=(64, 64)) -> None:
        """Load an official LoFTR checkpoint (indoor/outdoor ds). Requires
        cfg.official; see models/convert.convert_loftr_torch."""
        from mlis_tpu.models.convert import convert_loftr_torch

        if not self.cfg.official:
            raise ValueError("official checkpoints need LoFTRConfig(official=True)")
        self._init(shape)
        new = convert_loftr_torch(state_dict, self.params["params"])
        self.params = {"params": new}
        self._jit = {}

    def _init(self, shape):
        if self.params is None:
            d = jnp.zeros((1, *shape, 1), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(self._seed), d, d)

    def save_weights(self, path: str) -> None:
        """Ship in-env trained weights (train/loftr_trainer.py) as one npz."""
        from mlis_tpu.models.weights import save_params_npz

        save_params_npz(path, loftr=self.params["params"])

    def load_weights(self, path: str, image_hw=(264, 360)) -> None:
        """Load a save_weights npz. image_hw only shapes the param init
        (convs/attention are size-agnostic); non-multiples of 8 are
        rounded down like match_batch does."""
        import jax as _jax

        from mlis_tpu.models.convert import _match_dtypes
        from mlis_tpu.models.weights import load_params_npz

        trees = load_params_npz(path)
        self._init((int(image_hw[0]) // 8 * 8, int(image_hw[1]) // 8 * 8))
        self.params = _jax.device_put(
            _match_dtypes({"params": trees["loftr"]}, self.params)
        )
        self._jit = {}

    def match_batch(self, images0: jnp.ndarray, images1: jnp.ndarray) -> DenseMatches:
        """(B, H, W, 1) grayscale in [0,1]. Non-multiple-of-8 sizes are
        resized down to the nearest multiple (the reference's kornia
        contract, geometric_verification.py:469-526) and keypoints are
        rescaled back to input pixels."""
        H, W = int(images0.shape[1]), int(images0.shape[2])
        h8, w8 = (H // 8) * 8, (W // 8) * 8
        if (h8, w8) != (H, W):
            shape = (int(images0.shape[0]), h8, w8, 1)
            m = self.match_batch(
                jax.image.resize(images0, shape, method="linear"),
                jax.image.resize(images1, shape, method="linear"),
            )
            s = jnp.asarray([W / w8, H / h8], jnp.float32)
            return DenseMatches(m.kpts0 * s, m.kpts1 * s, m.scores, m.valid)
        self._init((H, W))
        key = (H, W)
        if key not in self._jit and self.cfg.official:
            self._jit[key] = jax.jit(
                lambda params, im0, im1: self.net.apply(params, im0, im1)
            )
        if key not in self._jit:
            cfg = self.cfg

            def _run(params, im0, im1):
                t0, t1, f0, f1, (hc, wc) = self.net.apply(params, im0, im1)
                sel0, sel1, scores, valid = coarse_match(
                    t0, t1, cfg.temperature, cfg.match_threshold, cfg.max_matches
                )
                # coarse grid coords
                x0 = (sel0 % wc).astype(jnp.float32)
                y0 = (sel0 // wc).astype(jnp.float32)
                x1 = (sel1 % wc).astype(jnp.float32)
                y1 = (sel1 // wc).astype(jnp.float32)
                # fine grid is 1/2 res; coarse is 1/8 -> factor 4
                fine_xy1 = jnp.stack([x1 * 4 + 1.5, y1 * 4 + 1.5], axis=-1)
                fine_xy0 = jnp.stack([x0 * 4 + 1.5, y0 * 4 + 1.5], axis=-1)

                def centers(fm, xy):
                    def per_image(m, c):
                        return m[
                            c[:, 1].astype(jnp.int32), c[:, 0].astype(jnp.int32)
                        ]

                    return jax.vmap(per_image)(fm.astype(jnp.float32), xy)

                feat0 = centers(f0, fine_xy0)
                refined1 = fine_refine(f1, fine_xy1, feat0, cfg.fine_window, 2)
                # to full-res pixels: fine grid stride 2, +0.5 cell center
                kpts0 = (x0 * 8 + 3.5), (y0 * 8 + 3.5)
                kpts0 = jnp.stack(kpts0, axis=-1)
                kpts1 = refined1 * 2.0 + 0.5
                return DenseMatches(kpts0, kpts1, scores, valid)

            self._jit[key] = jax.jit(_run)
        return self._jit[key](self.params, images0, images1)

    def detect_and_match(
        self, image1: np.ndarray, image2: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """uint8 images -> matched point arrays (reference resize contract:
        round down to multiple of 8, rescale keypoints back :469-526)."""
        h, w = image1.shape[:2]
        h8, w8 = (h // 8) * 8, (w // 8) * 8
        g1 = to_grayscale(jnp.asarray(image1)[None], size=(h8, w8))
        g2 = to_grayscale(jnp.asarray(image2)[None], size=(h8, w8))
        m = self.match_batch(g1, g2)
        valid = np.asarray(m.valid[0])
        sx, sy = w / w8, h / h8
        k0 = np.asarray(m.kpts0[0])[valid] * [sx, sy]
        k1 = np.asarray(m.kpts1[0])[valid] * [sx, sy]
        # detector-free method: "detected" keypoints == matched points
        self.last_detector_counts = (len(k0), len(k1))
        return k0, k1, np.asarray(m.scores[0])[valid]
