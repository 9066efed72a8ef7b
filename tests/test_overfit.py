"""End-to-end learning proof: single-batch overfit must recover the GT boxes.

Slow (minutes on the CPU test mesh) — gated behind AYOLO_SLOW_TESTS=1.
On TPU hardware (the bench environment), 400 steps of yolov5n@160 reach
38/38 TP@0.5 on the training batch; here a smaller setup checks the same
machinery: loss must fall sharply and detections must hit the GT.
"""

import os
from pathlib import Path

import numpy as np
import pytest

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"

pytestmark = pytest.mark.skipif(
    os.environ.get("AYOLO_SLOW_TESTS") != "1" or not Path(VOC_TRAIN).exists(),
    reason="slow; set AYOLO_SLOW_TESTS=1",
)


def test_single_batch_overfit():
    import jax
    import jax.numpy as jnp

    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.loss import ComputeLoss
    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.models.yolo_head import YOLOHead
    from ayolov2_tpu.ops.nms import batched_nms
    from ayolov2_tpu.train.optimizer import build_optimizer
    from ayolov2_tpu.train.train_state import create_train_state, make_train_step
    from ayolov2_tpu.utils.boxes import xywh2xyxy
    from ayolov2_tpu.utils.metrics import process_batch

    ds = DetectionDataset(VOC_TRAIN, img_size=96, batch_size=4, stride=32, n_skip=10)
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    batch = next(iter(loader))

    model = build_model("res/configs/model/yolov5n.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=96)
    head = YOLOHead(nc=20, anchors=model.anchors, strides=model.strides)
    hyp = {"optimizer_params": {"lr": 0.01}, "box": 0.05, "cls": 0.5, "obj": 1.0,
           "cls_pw": 1.0, "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
           "label_smoothing": 0.0, "weight_decay": 0.0, "lrf": 1.0,
           "warmup_min_iters": 30, "warmup_epochs": 0.1}
    loss_fn = ComputeLoss.from_hyp(head.stride_anchors(), 20, hyp)
    tx = build_optimizer(variables["params"], hyp, epochs=1, steps_per_epoch=250,
                         batch_size=4, accumulate=1)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.float32))

    imgs = jnp.asarray(batch.images)
    t = jnp.asarray(batch.targets)
    m = jnp.asarray(batch.target_mask)
    first = None
    for i in range(250):
        state, items = step(state, imgs, t, m)
        if i == 0:
            first = float(np.asarray(items)[3])
    last = float(np.asarray(items)[3])
    assert last < first * 0.5, (first, last)

    dec, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        imgs.astype(jnp.float32) / 255.0, training=False,
    )
    det, n = batched_nms(dec.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45,
                         nms_box=300, pre_top_k=64, keep_top_k=20, multi_label=False)
    det, n = np.asarray(det), np.asarray(n)
    tp = n_gt = 0
    targets, mask = np.asarray(batch.targets), np.asarray(batch.target_mask)
    for si in range(4):
        rows = targets[(targets[:, 0] == si) & mask]
        n_gt += len(rows)
        if n[si] and len(rows):
            lab = np.concatenate([rows[:, 1:2], xywh2xyxy(rows[:, 2:6] * 96)], 1)
            tp += process_batch(det[si, : n[si]], lab)[:, 0].sum()
    assert n_gt > 0
    assert tp >= n_gt * 0.5, (int(tp), n_gt)
