"""Torch re-implementation of the official LoFTR forward, used as the
parity ORACLE for models/convert.convert_loftr_torch.

State-dict names match the official zju3dv/kornia checkpoints (backbone.*,
loftr_coarse.layers.*, fine_preprocess.*, loftr_fine.layers.*), so:
  * a synthetic `LoFTRTorch(...).state_dict()` exercises the converter's
    name mapping on official-shaped dicts, and
  * a REAL indoor/outdoor-ds checkpoint loads into this model for
    activation-level parity against the converted Flax forward
    (tests/test_convert.py, skipped when no checkpoint is on disk).

Reference behavior slot: geometric_verification.py:424-526 (kornia LoFTR).
This file is an original implementation of the published architecture —
dims are parameterizable so tests can run a structurally-identical tiny
variant quickly on CPU.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv1x1(i, o, stride=1):
    return nn.Conv2d(i, o, 1, stride=stride, padding=0, bias=False)


def conv3x3(i, o, stride=1):
    return nn.Conv2d(i, o, 3, stride=stride, padding=1, bias=False)


class BasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = (
            None
            if stride == 1
            else nn.Sequential(
                conv1x1(in_planes, planes, stride=stride), nn.BatchNorm2d(planes)
            )
        )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class ResNetFPN_8_2(nn.Module):
    def __init__(self, initial_dim=128, block_dims=(128, 196, 256)):
        super().__init__()
        d0, d1, d2 = block_dims
        self.conv1 = nn.Conv2d(1, initial_dim, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.layer1 = self._make_layer(initial_dim, d0, 1)
        self.layer2 = self._make_layer(d0, d1, 2)
        self.layer3 = self._make_layer(d1, d2, 2)
        self.layer3_outconv = conv1x1(d2, d2)
        self.layer2_outconv = conv1x1(d1, d2)
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(d2, d2), nn.BatchNorm2d(d2), nn.LeakyReLU(), conv3x3(d2, d1)
        )
        self.layer1_outconv = conv1x1(d0, d1)
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(d1, d1), nn.BatchNorm2d(d1), nn.LeakyReLU(), conv3x3(d1, d0)
        )

    @staticmethod
    def _make_layer(in_planes, dim, stride):
        return nn.Sequential(BasicBlock(in_planes, dim, stride), BasicBlock(dim, dim, 1))

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear", align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_2x)
        x2_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear", align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_2x)
        return x3_out, x1_out  # coarse 1/8, fine 1/2


class PositionEncodingSine(nn.Module):
    def __init__(self, d_model, max_shape=(256, 256), temp_bug_fix=False):
        super().__init__()
        pe = torch.zeros((d_model, *max_shape))
        y_position = torch.ones(max_shape).cumsum(0).float().unsqueeze(0)
        x_position = torch.ones(max_shape).cumsum(1).float().unsqueeze(0)
        ar = torch.arange(0, d_model // 2, 2).float()
        if temp_bug_fix:
            div_term = torch.exp(ar * (-math.log(10000.0) / (d_model // 2)))
        else:  # released checkpoints: precedence bug kept for compatibility
            div_term = torch.exp(ar * (-math.log(10000.0) / d_model // 2))
        div_term = div_term[:, None, None]
        pe[0::4, :, :] = torch.sin(x_position * div_term)
        pe[1::4, :, :] = torch.cos(x_position * div_term)
        pe[2::4, :, :] = torch.sin(y_position * div_term)
        pe[3::4, :, :] = torch.cos(y_position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0), persistent=False)

    def forward(self, x):
        return x + self.pe[:, :, : x.size(2), : x.size(3)]


class LinearAttention(nn.Module):
    eps = 1e-6

    def forward(self, queries, keys, values):
        Q = F.elu(queries) + 1
        K = F.elu(keys) + 1
        v_length = values.size(1)
        values = values / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, values)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + self.eps)
        out = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
        return out.contiguous()


class LoFTREncoderLayer(nn.Module):
    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.attention = LinearAttention()
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(
            nn.Linear(d_model * 2, d_model * 2, bias=False),
            nn.ReLU(True),
            nn.Linear(d_model * 2, d_model, bias=False),
        )
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        message = self.attention(q, k, v)
        message = self.merge(message.view(bs, -1, self.nhead * self.dim))
        message = self.norm1(message)
        message = self.mlp(torch.cat([x, message], dim=2))
        message = self.norm2(message)
        return x + message


class LocalFeatureTransformer(nn.Module):
    def __init__(self, d_model, nhead, layer_names):
        super().__init__()
        self.layer_names = list(layer_names)
        self.layers = nn.ModuleList(
            [LoFTREncoderLayer(d_model, nhead) for _ in self.layer_names]
        )

    def forward(self, feat0, feat1):
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                feat0 = layer(feat0, feat0)
                feat1 = layer(feat1, feat1)
            else:
                feat0 = layer(feat0, feat1)
                feat1 = layer(feat1, feat0)
        return feat0, feat1


class FinePreprocess(nn.Module):
    def __init__(self, d_model_c, d_model_f, window=5):
        super().__init__()
        self.W = window
        self.down_proj = nn.Linear(d_model_c, d_model_f, bias=True)
        self.merge_feat = nn.Linear(2 * d_model_f, d_model_f, bias=True)

    def forward(self, feat_f0, feat_f1, feat_c0, feat_c1, b_ids, i_ids, j_ids, stride=4):
        W = self.W
        ww = W * W

        def unfold(fm):
            n, c = fm.shape[:2]
            u = F.unfold(fm, kernel_size=(W, W), stride=stride, padding=W // 2)
            return u.view(n, c, ww, -1).permute(0, 3, 2, 1)  # (n, l, ww, c)

        f0 = unfold(feat_f0)[b_ids, i_ids]
        f1 = unfold(feat_f1)[b_ids, j_ids]
        c_win = self.down_proj(torch.cat([feat_c0[b_ids, i_ids], feat_c1[b_ids, j_ids]], 0))
        cf = self.merge_feat(
            torch.cat(
                [torch.cat([f0, f1], 0), c_win.unsqueeze(1).repeat(1, ww, 1)], -1
            )
        )
        return cf.chunk(2)


def fine_matching(feat_f0, feat_f1, window):
    """Spatial expectation on the normalized [-1,1] window grid."""
    M, WW, C = feat_f0.shape
    center = feat_f0[:, WW // 2, :]
    sim = torch.einsum("mc,mrc->mr", center, feat_f1)
    heat = torch.softmax(sim / C**0.5, dim=1)
    lin = torch.linspace(-1.0, 1.0, window)
    gy, gx = torch.meshgrid(lin, lin, indexing="ij")
    ex = (heat * gx.reshape(-1)[None]).sum(-1)
    ey = (heat * gy.reshape(-1)[None]).sum(-1)
    return torch.stack([ex, ey], dim=-1)


class LoFTRTorch(nn.Module):
    """Assembled official model (backbone + coarse + fine stages)."""

    def __init__(
        self,
        initial_dim=128,
        block_dims=(128, 196, 256),
        d_coarse=256,
        d_fine=128,
        nhead=8,
        depth=4,
        window=5,
        temp_bug_fix=False,
    ):
        super().__init__()
        self.d_coarse = d_coarse
        self.window = window
        self.backbone = ResNetFPN_8_2(initial_dim, block_dims)
        self.pos_encoding = PositionEncodingSine(d_coarse, temp_bug_fix=temp_bug_fix)
        self.loftr_coarse = LocalFeatureTransformer(
            d_coarse, nhead, ["self", "cross"] * depth
        )
        self.fine_preprocess = FinePreprocess(d_coarse, d_fine, window)
        self.loftr_fine = LocalFeatureTransformer(d_fine, nhead, ["self", "cross"])

    @torch.no_grad()
    def forward_coarse(self, im0, im1):
        """im0/im1: (B, 1, H, W) in [0,1]. Returns backbone maps + coarse
        transformer outputs, all channel-last numpy-friendly tensors."""
        B = im0.size(0)
        c, f = self.backbone(torch.cat([im0, im1], 0))
        c = self.pos_encoding(c)
        hc, wc = c.shape[2:]
        t = c.flatten(2).transpose(1, 2)  # (2B, L, C)
        t0, t1 = self.loftr_coarse(t[:B], t[B:])
        return t0, t1, f[:B], f[B:], (hc, wc)

    @torch.no_grad()
    def conf_matrix(self, t0, t1, temperature=0.1):
        n0 = t0 / self.d_coarse**0.5
        n1 = t1 / self.d_coarse**0.5
        sim = torch.einsum("nlc,nsc->nls", n0, n1) / temperature
        return torch.softmax(sim, 2) * torch.softmax(sim, 1)

    @torch.no_grad()
    def forward_fine(self, f0, f1, t0, t1, b_ids, i_ids, j_ids):
        w0, w1 = self.fine_preprocess(f0, f1, t0, t1, b_ids, i_ids, j_ids)
        w0, w1 = self.loftr_fine(w0, w1)
        return w0, w1, fine_matching(w0, w1, self.window)
