"""LightGlue / SuperGlue matchers as fixed-depth batched transformers.

Reference behavior being reproduced (geometric_verification.py):
  * LightGlue: SuperPoint keypoints (max 2048, det thr 0.001) + learned
    matcher; match threshold on confidences (:216-312);
  * SuperGlue: same skeleton with Sinkhorn assignment, sinkhorn_iterations
    20, match_threshold 0.2 (:389-399).

TPU re-design notes:
  * LightGlue's adaptive early-exit / keypoint pruning does not batch on a
    static-shape compiler (SURVEY "hard parts"); this is the fixed-depth
    variant — L layers of self + cross attention always run, padding is
    handled with additive -inf attention bias from the keypoint masks.
  * Assignment heads: LightGlue-style dual-softmax with sigmoid
    matchability, or SuperGlue-style Sinkhorn-with-dustbin
    (ops/sinkhorn.py). Mutual-argmax + threshold yields fixed-size match
    arrays with a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlis_tpu.gating.verification import BaseFeatureMatcher
from mlis_tpu.models.superpoint import Keypoints, SuperPoint, SuperPointConfig
from mlis_tpu.ops.image import to_grayscale
from mlis_tpu.ops.sinkhorn import sinkhorn_with_dustbin


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    descriptor_dim: int = 256
    dim: int = 256
    num_heads: int = 4
    depth: int = 9
    match_threshold: float = 0.1
    assignment: str = "dual_softmax"  # 'dual_softmax' (LightGlue) | 'sinkhorn'
    sinkhorn_iterations: int = 20
    dtype: Any = jnp.bfloat16

    @staticmethod
    def lightglue(**kw) -> "MatcherConfig":
        return MatcherConfig(**kw)

    @staticmethod
    def superglue(**kw) -> "MatcherConfig":
        kw.setdefault("assignment", "sinkhorn")
        kw.setdefault("match_threshold", 0.2)
        return MatcherConfig(**kw)

    @staticmethod
    def tiny_test(**kw) -> "MatcherConfig":
        kw.setdefault("descriptor_dim", 32)
        kw.setdefault("dim", 32)
        kw.setdefault("num_heads", 2)
        kw.setdefault("depth", 2)
        return MatcherConfig(**kw)


class Matches(NamedTuple):
    idx0: jnp.ndarray  # (B, K0) int32 — best match in image1 per kpt, -1 invalid
    scores: jnp.ndarray  # (B, K0) matched confidence
    valid: jnp.ndarray  # (B, K0) bool mutual+threshold+mask


def normalize_keypoints(coords: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Center + scale by half the larger image side (official LightGlue
    keypoint normalization)."""
    h, w = image_hw
    size = jnp.asarray([w, h], jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (coords - shift) / scale


class RotaryEncoding(nn.Module):
    """Learnable-Fourier rotary positional encoding (official LightGlue):
    a bias-free (2 -> Dh/2) projection of normalized keypoint coords gives
    per-keypoint rotation angles, applied to q/k in SELF attention only."""

    head_dim: int

    @nn.compact
    def __call__(self, coords_norm: jnp.ndarray):
        Wr = self.param(
            "Wr",
            nn.initializers.normal(1.0),
            (2, self.head_dim // 2),
        )
        ang = coords_norm.astype(jnp.float32) @ Wr  # (B, K, Dh/2)
        return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate interleaved feature pairs: x (B, K, H, Dh), cos/sin (B, K, Dh/2)."""
    B, K, H, Dh = x.shape
    x2 = x.reshape(B, K, H, Dh // 2, 2)
    a, b = x2[..., 0], x2[..., 1]
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    ra = a * c - b * s
    rb = a * s + b * c
    return jnp.stack([ra, rb], axis=-1).reshape(B, K, H, Dh)


class AttnLayer(nn.Module):
    dim: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, source, source_valid, rot_x=None, rot_src=None):
        """Residual MHA(x <- source) + gated MLP (LightGlue layer shape:
        x + ffn(concat(x, message)) with LayerNorm inside the ffn).

        source_valid: (B, Ks) prefix-valid keypoint mask (top-k keypoints
        are score-sorted, so padding is always a suffix) — lets attention
        run through the KV-tiled flash kernel with lengths instead of a
        materialized (Kx, Ks) bias. rot_*: optional rotary (cos, sin) for
        self-attention positional encoding.
        """
        from mlis_tpu.ops.flash_attention import flash_mha

        B, Kx, _ = x.shape
        Dh = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(source)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(source)
        q = q.reshape(B, Kx, self.num_heads, Dh)
        k = k.reshape(B, source.shape[1], self.num_heads, Dh)
        v = v.reshape(B, source.shape[1], self.num_heads, Dh)
        if rot_x is not None:
            q = apply_rotary(q, *rot_x)
        if rot_src is not None:
            k = apply_rotary(k, *rot_src)
        Ks = source.shape[1]
        if jax.devices()[0].platform == "tpu" and Kx * Ks > 1024 * 1024:
            # long sequences: KV-tiled flash kernel (score matrix never
            # materializes)
            msg = flash_mha(q, k, v, kv_valid=source_valid)
        else:
            # matcher-scale sequences (<= 1k x 1k): XLA dense attention —
            # measures ~20% faster than the Pallas kernels here (11 vs
            # 14 ms/op at B=512, K=1024, H=4 on v5e) and identical to a
            # hand-written masked-softmax einsum pair (524 vs 528 ms full
            # matcher). A hand-decomposed bf16 softmax measured 66% SLOWER
            # (876 ms) — the dense op is already at the HBM roofline, so
            # let XLA own the softmax fusion. Prefix-valid masks map to
            # key_value_seq_lengths exactly (keypoints are score-sorted).
            kv_len = jnp.sum(source_valid, axis=-1).astype(jnp.int32)
            msg = jax.nn.dot_product_attention(
                q, k, v, key_value_seq_lengths=kv_len
            )
        msg = msg.reshape(B, Kx, self.dim).astype(self.dtype)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")(h).astype(self.dtype)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(h)
        return x + h


class MatcherBlock(nn.Module):
    """One self+cross round for both images; weights shared across images,
    distinct per depth (stacked by nn.scan).

    Both images ride ONE AttnLayer call on a concatenated (2B, K, D) batch
    (weights are shared, batch entries are independent, so this is
    numerically identical to two B-sized calls): self-attention sources the
    batch itself; cross-attention sources the image-swapped batch
    (jnp.roll by B). Half the kernel launches, 2x the GEMM rows."""

    dim: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, carry, _):
        xc, mc, ms, rotc = carry
        self_layer = AttnLayer(self.dim, self.num_heads, self.dtype, name="self")
        cross_layer = AttnLayer(self.dim, self.num_heads, self.dtype, name="cross")
        xc = self_layer(xc, xc, mc, rot_x=rotc, rot_src=rotc)
        B = xc.shape[0] // 2
        src = jnp.roll(xc, B, axis=0)  # [x1', x0'] — the other image's stream
        xc = cross_layer(xc, src, ms)
        return (xc, mc, ms, rotc), None


class MatcherNet(nn.Module):
    cfg: MatcherConfig

    @nn.compact
    def __call__(self, d0, c0, m0, d1, c1, m1, image_hw, return_matchability=False):
        """d: (B, K, Dd) descriptors, c: (B, K, 2) coords, m: (B, K) masks.

        return_matchability: additionally return per-keypoint matchable
        probabilities (mp0 (B, K0), mp1 (B, K1)) — sigmoid matchability for
        dual-softmax, 1 - dustbin mass for sinkhorn. Used by the training
        loss (train/matcher_trainer.py) to supervise unmatchable points."""
        cfg = self.cfg
        B = d0.shape[0]
        K0, K1 = d0.shape[1], d1.shape[1]
        if K0 != K1:  # pad the smaller stream with masked slots
            K = max(K0, K1)

            def _pad(a, k):
                return jnp.pad(a, ((0, 0), (0, K - k)) + ((0, 0),) * (a.ndim - 2))

            d0, c0, m0 = _pad(d0, K0), _pad(c0, K0), _pad(m0, K0)
            d1, c1, m1 = _pad(d1, K1), _pad(c1, K1), _pad(m1, K1)
        # weights are SHARED between the two images (LightGlue design):
        # both streams ride one concatenated (2B, K, D) batch end-to-end
        in_proj = nn.Dense(cfg.dim, dtype=cfg.dtype, name="in_proj")
        dc = jnp.concatenate([d0, d1], axis=0)
        xc = in_proj(dc.astype(cfg.dtype))

        # rotary positional encoding from normalized keypoint coords,
        # shared across depth, applied inside self-attention only
        # (official LightGlue design — cross attention is position-free)
        rotary = RotaryEncoding(cfg.dim // cfg.num_heads, name="posenc")
        cos, sin = rotary(
            normalize_keypoints(jnp.concatenate([c0, c1], axis=0), image_hw)
        )
        mc = jnp.concatenate([m0, m1], axis=0)
        ms = jnp.roll(mc, B, axis=0)

        # scan over depth: one traced body instead of `depth` unrolled
        # copies — keeps XLA compile time flat in depth
        blocks = nn.scan(
            MatcherBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.depth,
        )(cfg.dim, cfg.num_heads, cfg.dtype, name="blocks")
        (xc, _, _, _), _ = blocks((xc, mc, ms, (cos, sin)), None)

        # bf16 operands, f32 accumulation for the (K0, K1) similarity GEMM
        final_proj = nn.Dense(cfg.dim, dtype=cfg.dtype, name="final_proj")
        fc = final_proj(xc)
        f0, f1 = fc[:B], fc[B:]
        sim = jnp.einsum(
            "bkd,bld->bkl", f0, f1, preferred_element_type=jnp.float32
        ) / (cfg.dim**0.5)

        if cfg.assignment == "sinkhorn":
            alpha = self.param("dustbin", nn.initializers.ones, ())
            # invalid/padded slots must not receive transport mass: force
            # their similarities to -inf so normalization routes them to
            # the dustbin instead of diluting real matches
            sim_m = jnp.where(m0[:, :, None] & m1[:, None, :], sim, -1e9)
            log_p = sinkhorn_with_dustbin(sim_m, alpha, cfg.sinkhorn_iterations)
            scores = jnp.exp(log_p[:, :-1, :-1])
            if return_matchability:
                mp0 = 1.0 - jnp.exp(log_p[:, :-1, -1])
                mp1 = 1.0 - jnp.exp(log_p[:, -1, :-1])
                return scores[:, :K0, :K1], mp0[:, :K0], mp1[:, :K1]
        else:
            # LightGlue: dual softmax * matchability sigmoids
            matchability = nn.Dense(1, dtype=jnp.float32, name="matchability")
            z0 = matchability(f0)[..., 0]
            z1 = matchability(f1)[..., 0]
            mask2d = m0[:, :, None] & m1[:, None, :]
            sim_m = jnp.where(mask2d, sim, -1e30)
            p = jax.nn.softmax(sim_m, axis=2) * jax.nn.softmax(sim_m, axis=1)
            scores = p * jax.nn.sigmoid(z0)[:, :, None] * jax.nn.sigmoid(z1)[:, None, :]
            if return_matchability:
                return (
                    scores[:, :K0, :K1],
                    jax.nn.sigmoid(z0)[:, :K0],
                    jax.nn.sigmoid(z1)[:, :K1],
                )
        return scores[:, :K0, :K1]


def extract_matches(
    scores: jnp.ndarray,  # (B, K0, K1)
    m0: jnp.ndarray,
    m1: jnp.ndarray,
    threshold: float,
) -> Matches:
    """Mutual argmax + threshold, static shapes."""
    mask2d = m0[:, :, None] & m1[:, None, :]
    s = jnp.where(mask2d, scores, -1.0)
    best1 = jnp.argmax(s, axis=2)  # (B, K0)
    best0 = jnp.argmax(s, axis=1)  # (B, K1)
    k0 = jnp.arange(s.shape[1])
    mutual = jnp.take_along_axis(best0, best1, axis=1) == k0[None, :]
    sc = jnp.take_along_axis(s, best1[..., None], axis=2)[..., 0]
    valid = mutual & (sc > threshold) & m0
    return Matches(
        jnp.where(valid, best1, -1).astype(jnp.int32),
        jnp.where(valid, sc, 0.0),
        valid,
    )


class LightGlue(BaseFeatureMatcher):
    """SuperPoint + fixed-depth LightGlue, batched over pairs.

    API parity with the reference matcher (detect_and_match returning
    matched keypoint arrays + confidences) plus the TPU-native
    `match_batch` that keeps everything device-resident and fixed-shape.
    """

    matcher_cfg_factory = MatcherConfig.lightglue
    # detect_and_match confidences are dual-softmax probabilities — the
    # scale GeometricVerifier's confident-match cut assumes
    confidence_is_calibrated = True

    def __init__(
        self,
        max_keypoints: int = 2048,
        detection_threshold: float = 0.001,
        sp_cfg: Optional[SuperPointConfig] = None,
        matcher_cfg: Optional[MatcherConfig] = None,
        seed: int = 0,
    ):
        self.sp = SuperPoint(
            sp_cfg
            or SuperPointConfig(
                max_keypoints=max_keypoints, detection_threshold=detection_threshold
            ),
            seed=seed,
        )
        self.cfg = matcher_cfg or type(self).matcher_cfg_factory(
            descriptor_dim=self.sp.cfg.descriptor_dim
        )
        self.net = MatcherNet(self.cfg)
        self.params = None
        self._seed = seed
        self._jit_match = {}  # keyed by image_hw (posenc normalization)

    def _init(self, K0, K1, image_hw):
        if self.params is None:
            B = 1
            d0 = jnp.zeros((B, K0, self.cfg.descriptor_dim))
            d1 = jnp.zeros((B, K1, self.cfg.descriptor_dim))
            c0 = jnp.zeros((B, K0, 2))
            c1 = jnp.zeros((B, K1, 2))
            m = jnp.ones((B, K0), bool)
            m1 = jnp.ones((B, K1), bool)
            self.params = self.net.init(
                jax.random.PRNGKey(self._seed), d0, c0, m, d1, c1, m1, image_hw
            )

    def match_keypoints(
        self, kp0: Keypoints, kp1: Keypoints, image_hw: Tuple[int, int]
    ) -> Matches:
        image_hw = (int(image_hw[0]), int(image_hw[1]))
        self._init(kp0.coords.shape[1], kp1.coords.shape[1], image_hw)
        if image_hw not in self._jit_match:
            thr = self.cfg.match_threshold

            def _match(params, kp0, kp1):
                scores = self.net.apply(
                    params,
                    kp0.descriptors,
                    kp0.coords,
                    kp0.mask,
                    kp1.descriptors,
                    kp1.coords,
                    kp1.mask,
                    image_hw,
                )
                return extract_matches(scores, kp0.mask, kp1.mask, thr)

            self._jit_match[image_hw] = jax.jit(_match)
        return self._jit_match[image_hw](self.params, kp0, kp1)

    def match_batch(
        self, images0: jnp.ndarray, images1: jnp.ndarray
    ) -> Tuple[Keypoints, Keypoints, Matches]:
        """(B, H, W, 1) grayscale pairs -> keypoints + matches, device-resident."""
        kp0 = self.sp.detect(images0)
        kp1 = self.sp.detect(images1)
        hw = (int(images0.shape[1]), int(images0.shape[2]))
        return kp0, kp1, self.match_keypoints(kp0, kp1, hw)

    # -- fused device pipeline ---------------------------------------------------
    def make_fused_match_verify(
        self,
        image_hw: Tuple[int, int],
        K: np.ndarray,
        ransac_threshold: float = 3.0,
        num_hypotheses: int = 512,
        confident_threshold: float = 0.5,
        ransac_subset: int = 0,
    ):
        """Fused matcher + RANSAC + pose over PRE-DETECTED keypoints.

        Keyframes are detected once (SuperPoint is ~1 TFLOP/image at full
        resolution); candidate pairs then only pay for matching +
        verification. One device dispatch per pair batch.

        The last output is the count of HIGH-CONFIDENCE matches (score >=
        confident_threshold): repeated-structure false pairs produce many
        low-confidence mutual matches but almost no confident ones, so
        this count is the discriminative signal for
        GeometricVerifier(min_confident_matches=...).
        """
        from mlis_tpu.ops.epipolar import essential_ransac_batch

        image_hw = (int(image_hw[0]), int(image_hw[1]))
        self._init(self.sp.cfg.max_keypoints, self.sp.cfg.max_keypoints, image_hw)
        m_cfg = self.cfg
        K_j = jnp.asarray(K, jnp.float32)

        def run(m_params, kp_all: Keypoints, qi, mi, key):
            # gather the pair batch INSIDE the program: one dispatch for the
            # whole match+verify stage
            kp0 = jax.tree_util.tree_map(lambda x: x[qi], kp_all)
            kp1 = jax.tree_util.tree_map(lambda x: x[mi], kp_all)
            scores = self.net.apply(
                m_params,
                kp0.descriptors, kp0.coords, kp0.mask,
                kp1.descriptors, kp1.coords, kp1.mask,
                image_hw,
            )
            matches = extract_matches(
                scores, kp0.mask, kp1.mask, m_cfg.match_threshold
            )
            idx = jnp.clip(matches.idx0, 0, kp1.coords.shape[1] - 1)
            mk1 = jnp.take_along_axis(kp1.coords, idx[..., None], axis=1)
            res, T, good = essential_ransac_batch(
                kp0.coords, mk1, matches.valid, K_j, key,
                num_hypotheses, ransac_threshold, ransac_subset,
            )
            return (
                jnp.sum(kp0.mask, axis=1),
                jnp.sum(kp1.mask, axis=1),
                jnp.sum(matches.valid, axis=1),
                res.num_inliers,
                res.inlier_ratio,
                res.E,
                T,
                jnp.sum(
                    matches.valid & (matches.scores >= confident_threshold),
                    axis=1,
                ),
            )

        return jax.jit(run)

    def make_fused_verify(
        self,
        image_hw: Tuple[int, int],
        K: np.ndarray,
        ransac_threshold: float = 3.0,
        num_hypotheses: int = 512,
        confident_threshold: float = 0.5,
    ):
        """One jitted program: SuperPoint x2 -> matcher -> batched RANSAC ->
        pose. A single device dispatch per pair-batch (the multi-call path
        is dominated by per-dispatch latency through the TPU tunnel).
        Last output: high-confidence match count (see
        make_fused_match_verify)."""
        from mlis_tpu.models.superpoint import (
            nms_heatmap,
            sample_descriptors,
            topk_keypoints,
        )
        from mlis_tpu.ops.epipolar import essential_ransac_batch

        image_hw = (int(image_hw[0]), int(image_hw[1]))
        self.sp.init_params(image_hw)
        self._init(self.sp.cfg.max_keypoints, self.sp.cfg.max_keypoints, image_hw)
        sp_net, sp_cfg = self.sp.net, self.sp.cfg
        m_cfg = self.cfg
        K_j = jnp.asarray(K, jnp.float32)

        def run(sp_params, m_params, img0, img1, key):
            def detect(imgs):
                heat, dmap = sp_net.apply(sp_params, imgs)
                heat = nms_heatmap(heat, sp_cfg.nms_radius)
                coords, scores, mask = topk_keypoints(
                    heat, sp_cfg.max_keypoints, sp_cfg.detection_threshold
                )
                descs = sample_descriptors(dmap, coords)
                return Keypoints(coords, scores, descs, mask)

            kp0 = detect(img0)
            kp1 = detect(img1)
            scores = self.net.apply(
                m_params,
                kp0.descriptors, kp0.coords, kp0.mask,
                kp1.descriptors, kp1.coords, kp1.mask,
                image_hw,
            )
            matches = extract_matches(scores, kp0.mask, kp1.mask, m_cfg.match_threshold)
            idx = jnp.clip(matches.idx0, 0, kp1.coords.shape[1] - 1)
            mk1 = jnp.take_along_axis(kp1.coords, idx[..., None], axis=1)
            res, T, good = essential_ransac_batch(
                kp0.coords, mk1, matches.valid, K_j, key,
                num_hypotheses, ransac_threshold,
            )
            return (
                jnp.sum(kp0.mask, axis=1),
                jnp.sum(kp1.mask, axis=1),
                jnp.sum(matches.valid, axis=1),
                res.num_inliers,
                res.inlier_ratio,
                res.E,
                T,
                jnp.sum(
                    matches.valid & (matches.scores >= confident_threshold),
                    axis=1,
                ),
            )

        return jax.jit(run)

    # -- weight IO ---------------------------------------------------------------
    def load_torch_state_dict(
        self, matcher_sd=None, superpoint_sd=None, image_hw=(540, 720)
    ) -> None:
        """Load official checkpoints: cvg/LightGlue matcher and/or magicleap
        SuperPoint state dicts (torch tensors or numpy arrays)."""
        from mlis_tpu.models.convert import (
            convert_lightglue_torch,
            convert_superpoint_torch,
        )

        if superpoint_sd is not None:
            params = self.sp.init_params(image_hw)
            self.sp.params = jax.device_put({
                "params": convert_superpoint_torch(superpoint_sd, params["params"])
            })
        if matcher_sd is not None:
            self._init(self.sp.cfg.max_keypoints, self.sp.cfg.max_keypoints, image_hw)
            self.params = jax.device_put({
                "params": convert_lightglue_torch(matcher_sd, self.params["params"])
            })
            self._jit_match = {}

    def save_weights(self, path: str) -> None:
        """Ship the trained matcher AND its frozen SuperPoint front end in
        one npz — the matcher's learned mapping is tied to the exact
        detector filters it trained against, so they travel together."""
        from mlis_tpu.models.weights import save_params_npz

        save_params_npz(
            path,
            matcher=self.params["params"],
            superpoint=self.sp.params["params"],
        )

    def load_weights(self, path: str, image_hw=(270, 360)) -> None:
        """Load a save_weights npz (in-env trained checkpoint)."""
        from mlis_tpu.models.weights import load_params_npz

        from mlis_tpu.models.convert import _match_dtypes

        trees = load_params_npz(path)
        self.sp.init_params(image_hw)
        self._init(self.sp.cfg.max_keypoints, self.sp.cfg.max_keypoints, image_hw)
        if "superpoint" in trees:
            self.sp.params = _match_dtypes(
                {"params": trees["superpoint"]}, self.sp.params
            )
        self.params = _match_dtypes({"params": trees["matcher"]}, self.params)
        # device-put ONCE: _match_dtypes yields numpy leaves, and numpy
        # param trees passed as jit args re-transfer host->device on EVERY
        # dispatch (~53 MB = ~2.4 s/call through the 22 MB/s TPU tunnel —
        # measured round 3; random-init params are born device-resident,
        # which is why checkpoint loads regressed the bench before this)
        self.sp.params = jax.device_put(self.sp.params)
        self.params = jax.device_put(self.params)
        self._jit_match = {}

    # -- reference-parity single-pair API --------------------------------------
    def detect_and_match(
        self, image1: np.ndarray, image2: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """uint8 images -> (matched kpts1 (M,2), kpts2 (M,2), confidences)."""
        g1 = to_grayscale(jnp.asarray(image1)[None])
        g2 = to_grayscale(jnp.asarray(image2)[None])
        kp0, kp1, matches = self.match_batch(g1, g2)
        valid = np.asarray(matches.valid[0])
        idx = np.asarray(matches.idx0[0])[valid]
        pts0 = np.asarray(kp0.coords[0])[valid]
        pts1 = np.asarray(kp1.coords[0])[idx]
        conf = np.asarray(matches.scores[0])[valid]
        # detector keypoint totals (NOT matched-pair counts) for MatchResult
        # field fidelity — the batched path reports the same quantities
        self.last_detector_counts = (
            int(np.asarray(kp0.mask[0]).sum()),
            int(np.asarray(kp1.mask[0]).sum()),
        )
        return pts0, pts1, conf


class SuperGlue(LightGlue):
    """Sinkhorn-assignment variant (reference :353-421: 20 iterations,
    match threshold 0.2, LightGlue skeleton otherwise)."""

    matcher_cfg_factory = MatcherConfig.superglue
