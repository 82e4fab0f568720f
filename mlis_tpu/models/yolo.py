"""YOLOv8-style detector for dynamic-object masking, in Flax.

The reference's yolo-orb-slam3 variant runs YOLOv8n (ultralytics) to mask
dynamic COCO classes {0 person, 1 bicycle, 2 car, 3 motorcycle, 5 bus,
7 truck} with dilated bounding-box masks before feature extraction
(docker/Dockerfile.yolo-orb-slam3:227-352, dilation 10). TPU re-design:
  * YOLOv8 architecture (CSP backbone with C2f blocks, SPPF, FPN/PAN neck,
    decoupled anchor-free head with DFL box regression) as static-shape
    Flax modules, nano-width by default;
  * postprocessing with fixed budgets: top-N candidates, one (N, N) IoU
    matrix, greedy suppression as a fixed-length scan — no dynamic shapes;
  * `mask_dynamic_objects` rasterizes dilated boxes into a batched mask.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# COCO ids the reference masks (Dockerfile.yolo-orb-slam3)
DYNAMIC_COCO_CLASSES = (0, 1, 2, 3, 5, 7)


@dataclasses.dataclass(frozen=True)
class YOLOConfig:
    num_classes: int = 80
    width: float = 0.25  # nano
    depth: float = 1.0 / 3.0
    reg_max: int = 16  # DFL bins
    max_detections: int = 64
    score_threshold: float = 0.25
    iou_threshold: float = 0.45
    dtype: Any = jnp.bfloat16

    def ch(self, c: int) -> int:
        return max(8, int(round(c * self.width / 8)) * 8)

    def n(self, d: int) -> int:
        return max(1, int(round(d * self.depth)))

    @staticmethod
    def nano(**kw) -> "YOLOConfig":
        return YOLOConfig(**kw)

    @staticmethod
    def tiny_test(**kw) -> "YOLOConfig":
        kw.setdefault("width", 0.125)
        kw.setdefault("max_detections", 16)
        return YOLOConfig(**kw)


class ConvBNAct(nn.Module):
    ch: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(
            self.ch, (self.k, self.k), strides=(self.s, self.s),
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        # frozen BN folded as scale/bias params (inference framework)
        scale = self.param("bn_scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.ch,))
        x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.ch, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBNAct(self.ch, 3, dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.ch else y


class C2f(nn.Module):
    ch: int
    n: int
    shortcut: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = self.ch // 2
        y = ConvBNAct(self.ch, 1, dtype=self.dtype, name="cv1")(x)
        a, b = y[..., :h], y[..., h:]
        outs = [a, b]
        for i in range(self.n):
            b = Bottleneck(h, self.shortcut, self.dtype, name=f"m{i}")(b)
            outs.append(b)
        return ConvBNAct(self.ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1)
        )


class SPPF(nn.Module):
    ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = self.ch // 2
        x = ConvBNAct(h, 1, dtype=self.dtype, name="cv1")(x)
        outs = [x]
        for _ in range(3):
            x = nn.max_pool(x, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
            outs.append(x)
        return ConvBNAct(self.ch, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1)
        )


class YOLOv8(nn.Module):
    cfg: YOLOConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: (B, H, W, 3) float [0,1], H, W divisible by 32.
        Returns per-scale raw head outputs [(B, h, w, 4*reg_max + nc)]."""
        c = self.cfg
        ch = c.ch
        x = ConvBNAct(ch(64), 3, 2, c.dtype, name="stem")(images.astype(c.dtype))
        x = ConvBNAct(ch(128), 3, 2, c.dtype, name="down1")(x)
        x = C2f(ch(128), c.n(3), True, c.dtype, name="c2f1")(x)
        x = ConvBNAct(ch(256), 3, 2, c.dtype, name="down2")(x)
        p3 = C2f(ch(256), c.n(6), True, c.dtype, name="c2f2")(x)  # /8
        x = ConvBNAct(ch(512), 3, 2, c.dtype, name="down3")(p3)
        p4 = C2f(ch(512), c.n(6), True, c.dtype, name="c2f3")(x)  # /16
        x = ConvBNAct(ch(1024), 3, 2, c.dtype, name="down4")(p4)
        x = C2f(ch(1024), c.n(3), True, c.dtype, name="c2f4")(x)
        p5 = SPPF(ch(1024), c.dtype, name="sppf")(x)  # /32

        # FPN top-down
        def up(t):
            B, h, w, C = t.shape
            return jax.image.resize(t, (B, h * 2, w * 2, C), "nearest")

        f4 = C2f(ch(512), c.n(3), False, c.dtype, name="fpn4")(
            jnp.concatenate([up(p5), p4], axis=-1)
        )
        f3 = C2f(ch(256), c.n(3), False, c.dtype, name="fpn3")(
            jnp.concatenate([up(f4), p3], axis=-1)
        )
        # PAN bottom-up
        n4 = C2f(ch(512), c.n(3), False, c.dtype, name="pan4")(
            jnp.concatenate(
                [ConvBNAct(ch(256), 3, 2, c.dtype, name="pd3")(f3), f4], axis=-1
            )
        )
        n5 = C2f(ch(1024), c.n(3), False, c.dtype, name="pan5")(
            jnp.concatenate(
                [ConvBNAct(ch(512), 3, 2, c.dtype, name="pd4")(n4), p5], axis=-1
            )
        )

        outs = []
        head_out = 4 * c.reg_max + c.num_classes
        for i, f in enumerate((f3, n4, n5)):
            h = ConvBNAct(f.shape[-1], 3, dtype=c.dtype, name=f"head{i}_1")(f)
            h = nn.Conv(head_out, (1, 1), dtype=jnp.float32, name=f"head{i}_out")(h)
            outs.append(h.astype(jnp.float32))
        return outs


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, N, 4) xyxy pixels
    scores: jnp.ndarray  # (B, N)
    classes: jnp.ndarray  # (B, N) int32
    valid: jnp.ndarray  # (B, N) bool


def decode_predictions(
    raw: Sequence[jnp.ndarray], cfg: YOLOConfig, image_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw head maps -> (boxes xyxy (B, A, 4), class scores (B, A, nc))."""
    boxes_all, scores_all = [], []
    for lvl, r in enumerate(raw):
        B, h, w, _ = r.shape
        stride = image_hw[0] // h
        reg = r[..., : 4 * cfg.reg_max].reshape(B, h, w, 4, cfg.reg_max)
        dist = jnp.sum(
            jax.nn.softmax(reg, axis=-1)
            * jnp.arange(cfg.reg_max, dtype=jnp.float32),
            axis=-1,
        )  # (B, h, w, 4) distances l,t,r,b in stride units
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(B, h * w, 4)
        scores = jax.nn.sigmoid(r[..., 4 * cfg.reg_max :]).reshape(
            B, h * w, cfg.num_classes
        )
        boxes_all.append(boxes)
        scores_all.append(scores)
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyxy -> (N, N) IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_det",))
def nms_fixed(
    boxes: jnp.ndarray,  # (A, 4)
    scores: jnp.ndarray,  # (A,) best-class score
    classes: jnp.ndarray,  # (A,)
    score_threshold: float,
    iou_threshold: float,
    max_det: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape greedy NMS: top-max_det candidates, one IoU matrix,
    suppression as a fixed-length scan over rank order."""
    top_scores, order = jax.lax.top_k(scores, max_det)
    top_boxes = boxes[order]
    top_classes = classes[order]
    iou = _iou_matrix(top_boxes)
    same_class = top_classes[:, None] == top_classes[None, :]
    suppress_pair = (iou > iou_threshold) & same_class

    def body(keep, i):
        # i suppressed by any kept higher-ranked box?
        higher = jnp.arange(max_det) < i
        suppressed = jnp.any(suppress_pair[i] & keep & higher)
        keep = keep.at[i].set(~suppressed)
        return keep, None

    keep0 = jnp.ones(max_det, bool)
    keep, _ = jax.lax.scan(body, keep0, jnp.arange(max_det))
    valid = keep & (top_scores > score_threshold)
    return top_boxes, top_scores, top_classes.astype(jnp.int32), valid


class YOLODetector:
    """Batched detector wrapper: uint8 images -> Detections."""

    def __init__(self, cfg: YOLOConfig | None = None, input_size=(544, 736), seed=0):
        self.cfg = cfg or YOLOConfig.nano()
        self.input_size = input_size  # multiple of 32, close to 540x720
        self.net = YOLOv8(self.cfg)
        self.params = None
        self._seed = seed
        self._jit = None

    def _init(self):
        if self.params is None:
            d = jnp.zeros((1, *self.input_size, 3), jnp.float32)
            self.params = self.net.init(jax.random.PRNGKey(self._seed), d)

    def detect(self, images: np.ndarray) -> Detections:
        """(B, H, W, 3) uint8 BGR -> Detections in ORIGINAL pixel coords."""
        self._init()
        H, W = images.shape[1:3]
        ih, iw = self.input_size
        if self._jit is None:
            cfg = self.cfg

            def _run(params, imgs):
                x = imgs.astype(jnp.float32)[..., ::-1] / 255.0
                x = jax.image.resize(x, (x.shape[0], ih, iw, 3), "bilinear")
                raw = self.net.apply(params, x)
                boxes, cls_scores = decode_predictions(raw, cfg, (ih, iw))
                best = jnp.max(cls_scores, axis=-1)
                cls = jnp.argmax(cls_scores, axis=-1)
                return jax.vmap(
                    lambda b, s, c: nms_fixed(
                        b, s, c, cfg.score_threshold, cfg.iou_threshold,
                        cfg.max_detections,
                    )
                )(boxes, best, cls)

            self._jit = jax.jit(_run)
        b, s, c, v = self._jit(self.params, jnp.asarray(images))
        scale = jnp.asarray([W / iw, H / ih, W / iw, H / ih])
        b = b * scale
        # clamp to image bounds (DFL distances are unbounded)
        b = jnp.stack(
            [
                jnp.clip(b[..., 0], 0, W),
                jnp.clip(b[..., 1], 0, H),
                jnp.clip(b[..., 2], 0, W),
                jnp.clip(b[..., 3], 0, H),
            ],
            axis=-1,
        )
        return Detections(b, s, c, v)


@functools.partial(jax.jit, static_argnames=("dilation",))
def mask_dynamic_objects(
    images: jnp.ndarray,  # (B, H, W, C)
    boxes: jnp.ndarray,  # (B, N, 4) xyxy
    classes: jnp.ndarray,  # (B, N)
    valid: jnp.ndarray,  # (B, N)
    dynamic_classes: Tuple[int, ...] = DYNAMIC_COCO_CLASSES,
    dilation: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero out dilated dynamic-class boxes (reference masking semantics:
    bbox mask + dilation 10). Returns (masked images, mask (B, H, W))."""
    B, H, W = images.shape[:3]
    dyn = jnp.zeros_like(valid)
    for c in dynamic_classes:
        dyn = dyn | (classes == c)
    active = valid & dyn  # (B, N)

    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :]  # (1, 1, H)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x1 = boxes[..., 0:1] - dilation
    y1 = boxes[..., 1:2] - dilation
    x2 = boxes[..., 2:3] + dilation
    y2 = boxes[..., 3:4] + dilation
    in_y = (ys >= y1) & (ys <= y2)  # (B, N, H)
    in_x = (xs >= x1) & (xs <= x2)  # (B, N, W)
    box_mask = in_y[:, :, :, None] & in_x[:, :, None, :]  # (B, N, H, W)
    box_mask = box_mask & active[:, :, None, None]
    mask = jnp.any(box_mask, axis=1)  # (B, H, W) True where dynamic
    out = jnp.where(mask[..., None], 0, images)
    return out, mask


class DynamicObjectFilter:
    """Detector + masker with filtering statistics
    (feeds eval/semantic_eval.DynamicFilteringMetrics)."""

    def __init__(self, detector: YOLODetector | None = None, dilation: int = 10):
        self.detector = detector or YOLODetector()
        self.dilation = dilation
        self.total_frames = 0
        self.frames_with_dynamic = 0
        self.pixels_masked = 0
        self.pixels_total = 0

    def filter_batch(self, images: np.ndarray):
        det = self.detector.detect(images)
        masked, mask = mask_dynamic_objects(
            jnp.asarray(images), det.boxes, det.classes, det.valid,
            dilation=self.dilation,
        )
        mask_np = np.asarray(mask)
        self.total_frames += len(images)
        self.frames_with_dynamic += int(mask_np.any(axis=(1, 2)).sum())
        self.pixels_masked += int(mask_np.sum())
        self.pixels_total += int(mask_np.size)
        return np.asarray(masked), mask_np, det

    def get_metrics(self):
        from mlis_tpu.eval.semantic_eval import DynamicFilteringMetrics

        return DynamicFilteringMetrics(
            total_frames=self.total_frames,
            frames_with_dynamic_objects=self.frames_with_dynamic,
            total_features_extracted=self.pixels_total,
            features_filtered=self.pixels_masked,
        )
