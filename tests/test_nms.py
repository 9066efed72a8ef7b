"""NMS keep-set parity vs an independent numpy greedy reference.

The numpy oracle below is a direct transcription of the classic greedy NMS
algorithm (sort by score, suppress IoU > thr), which is what
torchvision.ops.nms implements — the reference's keep-set semantics
(scripts/utils/nms.py:66, scripts/utils/metrics.py:385-389).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.ops.nms import MAX_WH, batched_nms, detections_to_list, non_max_suppression_np


def np_greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Oracle: indices kept by greedy NMS, score-descending."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + area - inter + 1e-7)
        suppressed |= iou > iou_thres
    return np.array(keep)


def _random_pred(rng, bs=2, n=120, nc=8, img=640):
    """Synthesize decoded predictions (bs, n, 5+nc): xywh + obj + cls probs."""
    xy = rng.uniform(50, img - 50, (bs, n, 2))
    wh = rng.uniform(10, 120, (bs, n, 2))
    obj = rng.uniform(0, 1, (bs, n, 1))
    cls = rng.dirichlet(np.ones(nc) * 0.2, (bs, n))
    return np.concatenate([xy, wh, obj, cls], axis=-1).astype(np.float32)


def test_greedy_nms_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pred = _random_pred(rng)
    conf_t, iou_t = 0.1, 0.5

    det, n_valid = batched_nms(
        jnp.asarray(pred), conf_thres=conf_t, iou_thres=iou_t,
        nms_box=120, pre_top_k=120, keep_top_k=120, multi_label=False, nms_type="nms",
    )
    got = detections_to_list(np.asarray(det), np.asarray(n_valid))

    for b in range(pred.shape[0]):
        # independent oracle path: best-class confidences
        confs = pred[b, :, 5:] * pred[b, :, 4:5]
        scores = confs.max(-1)
        cls = confs.argmax(-1).astype(np.float32)
        m = scores > conf_t
        xy, wh = pred[b, m, :2], pred[b, m, 2:4]
        boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
        keep = np_greedy_nms(boxes + cls[m, None] * MAX_WH, scores[m], iou_t)

        want_boxes = boxes[keep]
        want_scores = scores[m][keep]
        assert len(got[b]) == len(keep), f"image {b}: {len(got[b])} vs {len(keep)}"
        # sort both by score to compare (ties are rare with random floats)
        np.testing.assert_allclose(np.sort(got[b][:, 4]), np.sort(want_scores), rtol=1e-5)
        order_got = np.argsort(-got[b][:, 4])
        order_want = np.argsort(-want_scores)
        np.testing.assert_allclose(
            got[b][order_got, :4], want_boxes[order_want], rtol=1e-4, atol=1e-2
        )


def test_agnostic_suppresses_across_classes():
    # two identical boxes, different classes, both high conf
    pred = np.zeros((1, 2, 7), dtype=np.float32)
    pred[0, :, :2] = 100  # xy
    pred[0, :, 2:4] = 50  # wh
    pred[0, :, 4] = 0.9  # obj
    pred[0, 0, 5] = 0.9
    pred[0, 1, 6] = 0.8
    common = dict(conf_thres=0.1, iou_thres=0.5, nms_box=2, pre_top_k=2, keep_top_k=5, multi_label=False)
    _, n_class = batched_nms(jnp.asarray(pred), agnostic=False, **common)
    _, n_agn = batched_nms(jnp.asarray(pred), agnostic=True, **common)
    assert int(n_class[0]) == 2  # different classes survive class-aware NMS
    assert int(n_agn[0]) == 1  # agnostic suppresses the weaker one


def test_multi_label_emits_per_class_detections():
    pred = np.zeros((1, 1, 7), dtype=np.float32)
    pred[0, 0, :2] = 100
    pred[0, 0, 2:4] = 50
    pred[0, 0, 4] = 1.0
    pred[0, 0, 5] = 0.8
    pred[0, 0, 6] = 0.7
    det, n = batched_nms(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5,
        nms_box=1, pre_top_k=2, keep_top_k=5, multi_label=True,
    )
    assert int(n[0]) == 2
    assert set(np.asarray(det[0, :2, 5]).astype(int)) == {0, 1}


@pytest.mark.parametrize("nms_type", ["fast_nms", "matrix_nms", "merge_nms"])
def test_nms_variants_run_and_bound(nms_type):
    rng = np.random.default_rng(1)
    pred = _random_pred(rng, bs=1, n=120)
    det, n = batched_nms(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5,
        nms_box=120, pre_top_k=120, keep_top_k=100, multi_label=False, nms_type=nms_type,
    )
    assert det.shape == (1, 100, 6)
    assert 0 < int(n[0]) <= 100
    kept = np.asarray(det[0, : int(n[0])])
    assert (kept[:, 4] > 0).all()
    # scores must be descending
    assert (np.diff(kept[:, 4]) <= 1e-6).all()


def test_fixed_output_contract():
    """Zero-padding + counts: the TRT BatchedNMS output contract."""
    rng = np.random.default_rng(2)
    pred = _random_pred(rng, bs=3, n=100)
    det, n = batched_nms(
        jnp.asarray(pred), conf_thres=0.9, iou_thres=0.5,
        nms_box=100, pre_top_k=100, keep_top_k=20, multi_label=False,
    )
    det, n = np.asarray(det), np.asarray(n)
    assert det.shape == (3, 20, 6)
    for b in range(3):
        assert (det[b, n[b]:] == 0).all()


def test_hybrid_label_injection():
    """GT labels appended as perfect detections (metrics.py:341-348)."""
    pred = np.zeros((1, 5, 7), dtype=np.float32)  # no real detections
    labels = [np.array([[1, 100.0, 100.0, 40.0, 40.0]])]  # cls=1 xywh
    out = non_max_suppression_np(pred, conf_thres=0.25, labels=labels)
    assert len(out[0]) == 1
    np.testing.assert_allclose(out[0][0, :4], [80, 80, 120, 120], atol=1e-3)
    assert out[0][0, 5] == 1


def test_fused_decode_nms_matches_plain_path():
    """fused_decode_nms == decode-all-then-batched_nms on the same raw maps."""
    import jax
    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.ops.nms import batched_nms, flat_grid_meta, flatten_raw_maps, fused_decode_nms
    from ayolov2_tpu.models.yolo_head import YOLOHead

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8))
    xf = x.astype(jnp.float32) / 255.0
    decoded, raw = model.apply(variables, xf, training=False)

    head = YOLOHead(nc=20, anchors=model.anchors, strides=model.strides)
    grid_xy, anchor_wh, stride = flat_grid_meta(model.strides, head.anchor_grid(), (64, 64))
    kw = dict(conf_thres=0.001, iou_thres=0.5, nms_box=200, pre_top_k=64,
              keep_top_k=20, multi_label=False)
    det_ref, n_ref = batched_nms(decoded.astype(jnp.float32), **kw)
    det_fused, n_fused = fused_decode_nms(
        flatten_raw_maps(raw), jnp.asarray(grid_xy), jnp.asarray(anchor_wh),
        jnp.asarray(stride), **kw)

    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_fused))
    np.testing.assert_allclose(np.asarray(det_fused), np.asarray(det_ref), atol=2e-3, rtol=1e-4)


def test_fused_decode_nms_approx_prefilter():
    """approx_prefilter=True (serving knob, lax.approx_max_k recall 0.99)
    keeps the output contract and agrees with exact mode on confident
    detections. Exact tail agreement is backend-dependent by design — on
    the real TPU, zero keep-set diff above conf 0.01 was measured across
    all 99 fixture images (STATUS.md round-3 decode restructure)."""
    from ayolov2_tpu.ops.nms import fused_decode_nms

    rng = np.random.default_rng(3)
    N, nc = 1200, 20
    raw = jnp.asarray(rng.normal(-4, 2, (2, N, 5 + nc)).astype(np.float32))
    grid_xy = jnp.asarray(rng.uniform(0, 8, (N, 2)).astype(np.float32))
    anchor_wh = jnp.asarray(rng.uniform(4, 60, (N, 2)).astype(np.float32))
    stride = jnp.asarray(np.full((N, 1), 8.0, np.float32))
    kw = dict(conf_thres=0.001, iou_thres=0.5, nms_box=128, pre_top_k=64,
              keep_top_k=20, multi_label=False)
    de, ne = fused_decode_nms(raw, grid_xy, anchor_wh, stride, **kw)
    da, na = fused_decode_nms(raw, grid_xy, anchor_wh, stride,
                              approx_prefilter=True, **kw)
    assert da.shape == de.shape and na.shape == ne.shape
    # confident detections (well above the prefilter tail) must agree
    conf = 0.05
    for i in range(de.shape[0]):
        e = np.asarray(de[i]); a = np.asarray(da[i])
        e, a = e[e[:, 4] > conf], a[a[:, 4] > conf]
        np.testing.assert_allclose(np.sort(e, 0), np.sort(a, 0), atol=1e-3)


def test_nms_classes_filter():
    """classes debug filter (metrics.py:366-368 parity)."""
    from ayolov2_tpu.ops.nms import non_max_suppression_np

    rng = np.random.default_rng(0)
    pred = np.concatenate([
        rng.uniform(100, 300, (1, 40, 2)),
        rng.uniform(20, 60, (1, 40, 2)),
        rng.uniform(0.5, 1, (1, 40, 1)),
        rng.uniform(0, 1, (1, 40, 3)),
    ], -1).astype(np.float32)
    out_all = non_max_suppression_np(pred, conf_thres=0.2, iou_thres=0.5)
    out_c0 = non_max_suppression_np(pred, conf_thres=0.2, iou_thres=0.5, classes=[0])
    assert all((d[:, 5] == 0).all() for d in out_c0)
    assert sum(len(d) for d in out_c0) <= sum(len(d) for d in out_all)


def test_greedy_suppress_long_chain_fixpoint():
    """Adversarial case for the Jacobi fixed-point suppression: a long chain
    of boxes where each overlaps only its neighbor. Greedy semantics keep
    every other box (a box suppressed by a DEAD box must come back) — the
    suppression-chain depth equals the chain length, the worst case for
    iterative solvers."""
    from ayolov2_tpu.ops.nms import _box_iou_matrix, _greedy_suppress

    n = 60
    # unit-height boxes, each shifted by 0.4 widths: IoU(i, i+1) ~ 0.43 > thr,
    # IoU(i, i+2) ~ 0.08 < thr
    x0 = np.arange(n, dtype=np.float32) * 0.4
    boxes = np.stack([x0, np.zeros(n, np.float32), x0 + 1.0, np.ones(n, np.float32)], -1)
    iou = _box_iou_matrix(jnp.asarray(boxes))
    keep = np.asarray(_greedy_suppress(iou, jnp.ones(n, bool), 0.3))
    # scores descend with index: greedy keeps 0, kills 1, keeps 2, ...
    np.testing.assert_array_equal(keep, np.arange(n) % 2 == 0)

    # cross-check vs the numpy oracle on the same geometry
    want = np_greedy_nms(boxes, np.linspace(1.0, 0.5, n).astype(np.float32), 0.3)
    np.testing.assert_array_equal(np.flatnonzero(keep), np.sort(want))
