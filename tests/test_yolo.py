"""YOLO dynamic-object filtering tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlis_tpu.models.yolo import (
    DYNAMIC_COCO_CLASSES,
    Detections,
    DynamicObjectFilter,
    YOLOConfig,
    YOLODetector,
    YOLOv8,
    decode_predictions,
    mask_dynamic_objects,
    nms_fixed,
)


def test_yolov8_forward_shapes():
    cfg = YOLOConfig.tiny_test()
    net = YOLOv8(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 12, 4 * cfg.reg_max + cfg.num_classes)
    assert outs[1].shape[1:3] == (4, 6)
    assert outs[2].shape[1:3] == (2, 3)


def test_decode_predictions_in_bounds():
    cfg = YOLOConfig.tiny_test()
    net = YOLOv8(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    boxes, scores = decode_predictions(net.apply(params, x), cfg, (64, 96))
    assert boxes.shape[-1] == 4
    assert scores.shape[-1] == cfg.num_classes
    assert np.asarray(scores).min() >= 0 and np.asarray(scores).max() <= 1


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([0, 0, 0, 2])  # last overlaps box0 but other class
    b, s, c, v = nms_fixed(boxes, scores, classes, 0.5, 0.45, max_det=4)
    v = np.asarray(v)
    # box1 suppressed by box0; box2 kept; box3 kept (different class)
    assert v.tolist() == [True, False, True, True]


def test_nms_score_threshold():
    boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    b, s, c, v = nms_fixed(
        boxes, jnp.asarray([0.9, 0.1]), jnp.asarray([0, 0]), 0.25, 0.45, max_det=2
    )
    assert np.asarray(v).tolist() == [True, False]


def test_mask_dynamic_objects_semantics():
    imgs = jnp.ones((1, 40, 60, 3), jnp.uint8) * 200
    boxes = jnp.asarray([[[10, 10, 20, 20], [40, 5, 50, 15]]], jnp.float32)
    classes = jnp.asarray([[0, 56]])  # person (dynamic) + chair (static)
    valid = jnp.asarray([[True, True]])
    masked, mask = mask_dynamic_objects(imgs, boxes, classes, valid, dilation=2)
    masked = np.asarray(masked)
    mask = np.asarray(mask)
    # person box (dilated by 2) zeroed
    assert (masked[0, 12:19, 12:19] == 0).all()
    assert mask[0, 8, 8] and not mask[0, 7, 7]  # dilation boundary
    # chair region untouched
    assert (masked[0, 6:14, 41:49] == 200).all()


def test_detector_end_to_end_tiny(rng):
    det = YOLODetector(YOLOConfig.tiny_test(), input_size=(64, 96))
    imgs = rng.integers(0, 255, (2, 54, 72, 3), dtype=np.uint8)
    out = det.detect(imgs)
    assert isinstance(out, Detections)
    assert out.boxes.shape == (2, 16, 4)
    # boxes rescaled to original pixel space
    assert np.asarray(out.boxes).max() <= 100


def test_dynamic_filter_metrics(rng):
    det = YOLODetector(YOLOConfig.tiny_test(score_threshold=-1.0), input_size=(64, 96))
    filt = DynamicObjectFilter(detector=det, dilation=2)
    imgs = rng.integers(0, 255, (2, 54, 72, 3), dtype=np.uint8)
    masked, mask, detections = filt.filter_batch(imgs)
    m = filt.get_metrics()
    assert m.total_frames == 2
    assert 0.0 <= m.feature_filter_rate <= 1.0
    assert masked.shape == imgs.shape
