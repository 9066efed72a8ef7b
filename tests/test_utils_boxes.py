"""Coordinate-transform round trips (parity: tests/test_utils_general.py:16-47)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.utils.boxes import (
    bbox_iou,
    box_iou,
    clip_coords,
    scale_coords,
    wh_iou,
    xywh2xyxy,
    xyxy2xywh,
)


def _rand_xyxy(n, rng, w=640, h=480):
    x1 = rng.uniform(0, w * 0.8, n)
    y1 = rng.uniform(0, h * 0.8, n)
    x2 = x1 + rng.uniform(1, w * 0.2, n)
    y2 = y1 + rng.uniform(1, h * 0.2, n)
    return np.stack([x1, y1, x2, y2], -1)


@pytest.mark.parametrize("xp", [np, jnp])
def test_xywh_xyxy_roundtrip(xp):
    rng = np.random.default_rng(0)
    boxes = xp.asarray(_rand_xyxy(100, rng))
    # pure format round-trip: validity shrink off (it clamps pixel-space
    # boxes treated as normalized)
    rt = xywh2xyxy(xyxy2xywh(boxes, check_validity=False))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(boxes), atol=1e-4)


def test_xyxy2xywh_normalized():
    boxes = np.array([[10.0, 20.0, 30.0, 60.0]])
    out = xyxy2xywh(boxes, wh=(100.0, 200.0))
    np.testing.assert_allclose(out, [[0.2, 0.2, 0.2, 0.2]])


def test_scale_coords_inverts_letterbox():
    # native 480x640 (h, w) letterboxed into 640x640: gain=1.0, pad=(0, 80)
    native = (480, 640)
    letter = (640, 640)
    coords = np.array([[100.0, 180.0, 200.0, 280.0]])
    out = scale_coords(letter, coords, native)
    np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]])


def test_clip_coords():
    boxes = np.array([[-5.0, -5.0, 700.0, 500.0]])
    out = clip_coords(boxes, (640, 480))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 480.0]])


@pytest.mark.parametrize("xp", [np, jnp])
def test_box_iou_known_values(xp):
    a = xp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = xp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_bbox_iou_variants_bounds():
    rng = np.random.default_rng(1)
    a = _rand_xyxy(50, rng)
    b = _rand_xyxy(50, rng)
    plain = bbox_iou(a, b)
    for kw in ({"g_iou": True}, {"d_iou": True}, {"c_iou": True}):
        v = bbox_iou(a, b, **kw)
        assert (v <= plain + 1e-6).all()  # penalty terms only subtract
        assert (v >= -2 - 1e-6).all()  # CIoU's aspect term can push below -1


def test_bbox_iou_identical_is_one():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    for kw in ({}, {"g_iou": True}, {"d_iou": True}, {"c_iou": True}):
        np.testing.assert_allclose(bbox_iou(a, a, **kw), [1.0], atol=1e-5)


def test_wh_iou():
    wh1 = np.array([[10.0, 10.0]])
    wh2 = np.array([[10.0, 10.0], [5.0, 20.0]])
    np.testing.assert_allclose(wh_iou(wh1, wh2)[0], [1.0, 50.0 / 150.0], atol=1e-6)
