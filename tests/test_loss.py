"""Loss parity: static-shape masked loss vs an independent dynamic oracle.

The numpy oracle below re-implements the published YOLOv5 loss algorithm with
ordinary variable-length arrays (the same semantics as the reference's
scripts/loss/losses.py:168-391). The production ComputeLoss must reproduce its
values exactly despite the fixed-capacity slot formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.loss import ComputeLoss, pad_targets
from ayolov2_tpu.loss.yolo_loss import smooth_bce
from ayolov2_tpu.utils.boxes import bbox_iou

HYP = {
    "box": 0.05,
    "cls": 0.5,
    "obj": 1.0,
    "cls_pw": 1.0,
    "obj_pw": 1.0,
    "anchor_t": 4.0,
    "fl_gamma": 0.0,
    "label_smoothing": 0.0,
}

ANCHORS = (
    np.array([[10, 13], [16, 30], [33, 23]], np.float32) / 8.0,
    np.array([[30, 61], [62, 45], [59, 119]], np.float32) / 16.0,
    np.array([[116, 90], [156, 198], [373, 326]], np.float32) / 32.0,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _bce(logits, targets, pw=1.0):
    # numerically-stable elementwise BCE-with-logits
    log_p = -np.logaddexp(0, -logits)
    log_np = -np.logaddexp(0, logits)
    return -(pw * targets * log_p + (1 - targets) * log_np)


def oracle_loss(preds, labels, nc, hyp, anchors):
    """Dynamic-shape YOLOv5 loss oracle.

    preds: list of (bs, ny, nx, na, 5+nc); labels: list per image of (n, 5)
    [cls, xywh-normalized].
    """
    bs = preds[0].shape[0]
    na = 3
    balance = [4.0, 1.0, 0.4]
    cp, cn = smooth_bce(hyp["label_smoothing"])
    # targets (nt, 6): img, cls, xywh
    rows = []
    for i, lab in enumerate(labels):
        for r in lab:
            rows.append([i, *r])
    targets = np.array(rows, np.float32).reshape(-1, 6)
    nt = len(targets)

    lbox = lobj = lcls = 0.0
    for li, pred in enumerate(preds):
        ny, nx = pred.shape[1], pred.shape[2]
        anc = anchors[li]
        gain = np.array([1, 1, nx, ny, nx, ny], np.float32)
        tobj = np.zeros((bs, ny, nx, na), np.float32)
        # build matched slots dynamically
        matched = []  # (b, a, gj, gi, txy, twh, cls)
        if nt:
            t = targets * gain
            for a in range(na):
                r = t[:, 4:6] / anc[a]
                j = np.maximum(r, 1 / r).max(-1) < hyp["anchor_t"]
                tm = t[j]
                for row in tm:
                    gxy = row[2:4]
                    gxi = gain[2:4] - gxy
                    offs = [np.array([0.0, 0.0])]
                    if gxy[0] % 1 < 0.5 and gxy[0] > 1:
                        offs.append(np.array([0.5, 0.0]))
                    if gxy[1] % 1 < 0.5 and gxy[1] > 1:
                        offs.append(np.array([0.0, 0.5]))
                    if gxi[0] % 1 < 0.5 and gxi[0] > 1:
                        offs.append(np.array([-0.5, 0.0]))
                    if gxi[1] % 1 < 0.5 and gxi[1] > 1:
                        offs.append(np.array([0.0, -0.5]))
                    for off in offs:
                        gij = np.floor(gxy - off)
                        gi = int(np.clip(gij[0], 0, nx - 1))
                        gj = int(np.clip(gij[1], 0, ny - 1))
                        matched.append(
                            (int(row[0]), a, gj, gi, gxy - np.array([gi, gj]), row[4:6], int(row[1]))
                        )
        n = len(matched)
        if n:
            ious = []
            tcls_arr = np.full((n, nc), cn, np.float32)
            ps_cls = np.zeros((n, nc), np.float32)
            for s, (b, a, gj, gi, txy, twh, cls) in enumerate(matched):
                ps = pred[b, gj, gi, a]
                pxy = _sigmoid(ps[0:2]) * 2 - 0.5
                pwh = (_sigmoid(ps[2:4]) * 2) ** 2 * anc[a]
                pbox = np.concatenate([pxy, pwh])
                tbox = np.concatenate([txy, twh])
                iou = float(bbox_iou(pbox, tbox, x1y1x2y2=False, c_iou=True))
                ious.append(iou)
                tobj[b, gj, gi, a] = max(tobj[b, gj, gi, a], max(iou, 0.0))
                tcls_arr[s, cls] = cp
                ps_cls[s] = ps[5:]
            lbox += np.mean(1.0 - np.array(ious))
            if nc > 1:
                lcls += _bce(ps_cls, tcls_arr, hyp["cls_pw"]).mean()
        lobj += _bce(pred[..., 4], tobj, hyp["obj_pw"]).mean() * balance[li]

    lbox *= hyp["box"]
    lobj *= hyp["obj"]
    lcls *= hyp["cls"]
    total = lbox + lobj + lcls
    return total * bs, np.array([lbox, lobj, lcls, total])


def _fake_batch(rng, bs=2, nc=6, img=64, n_labels=(3, 5)):
    preds = []
    for s in (8, 16, 32):
        g = img // s
        preds.append(rng.normal(0, 1, (bs, g, g, 3, 5 + nc)).astype(np.float32))
    labels = []
    for i in range(bs):
        n = n_labels[i % len(n_labels)]
        cls = rng.integers(0, nc, n)
        xy = rng.uniform(0.15, 0.85, (n, 2))
        wh = rng.uniform(0.05, 0.4, (n, 2))
        labels.append(np.concatenate([cls[:, None], xy, wh], -1).astype(np.float32))
    return preds, labels


def test_loss_matches_dynamic_oracle():
    rng = np.random.default_rng(0)
    preds, labels = _fake_batch(rng)
    nc = 6
    loss_fn = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, HYP)
    tg, mask = pad_targets(labels, batch_size=2, max_targets=32)
    got_total, got_items = jax.jit(loss_fn)([jnp.asarray(p) for p in preds], jnp.asarray(tg), jnp.asarray(mask))
    want_total, want_items = oracle_loss(preds, labels, nc, HYP, ANCHORS)
    np.testing.assert_allclose(np.asarray(got_items), want_items, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(got_total), want_total, rtol=2e-4)


def test_loss_no_labels():
    rng = np.random.default_rng(1)
    preds, _ = _fake_batch(rng)
    nc = 6
    loss_fn = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, HYP)
    tg, mask = pad_targets([np.zeros((0, 5))] * 2, 2, 32)
    total, items = loss_fn([jnp.asarray(p) for p in preds], jnp.asarray(tg), jnp.asarray(mask))
    assert np.isfinite(float(total))
    assert float(items[0]) == 0.0  # no box loss
    assert float(items[2]) == 0.0  # no cls loss
    assert float(items[1]) > 0.0  # obj loss still penalizes background


def test_loss_gradients_finite():
    rng = np.random.default_rng(2)
    preds, labels = _fake_batch(rng)
    nc = 6
    loss_fn = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, HYP)
    tg, mask = pad_targets(labels, 2, 32)

    def f(ps):
        total, _ = loss_fn(ps, jnp.asarray(tg), jnp.asarray(mask))
        return total

    grads = jax.grad(f)([jnp.asarray(p) for p in preds])
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_focal_and_smoothing_change_loss():
    rng = np.random.default_rng(3)
    preds, labels = _fake_batch(rng)
    nc = 6
    tg, mask = pad_targets(labels, 2, 32)
    base = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, HYP)
    focal = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, dict(HYP, fl_gamma=1.5))
    smooth = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, dict(HYP, label_smoothing=0.1))
    args = ([jnp.asarray(p) for p in preds], jnp.asarray(tg), jnp.asarray(mask))
    t0, _ = base(*args)
    t1, _ = focal(*args)
    t2, _ = smooth(*args)
    assert float(t1) != float(t0)
    assert float(t2) != float(t0)
    # focal downweights easy negatives -> smaller obj loss on random preds
    assert float(t1) < float(t0)


def test_padded_batch_loss_matches_short_batch():
    """A padded final val batch (rows duplicated to keep static shapes) with
    target-slot masking + image_weight reproduces the short batch's loss
    items EXACTLY — the reference's short-last-batch averaging semantics
    (train_utils.py:285-292; ADVICE r2 validator finding)."""
    rng = np.random.default_rng(2)
    nc = 6
    n_real, bs = 3, 4
    preds, labels = _fake_batch(rng, bs=n_real, nc=nc, n_labels=(3, 5, 2))
    loss_fn = ComputeLoss.from_hyp(np.stack(ANCHORS), nc, HYP)

    # ground truth: the short batch on its own
    tg, mask = pad_targets(labels, batch_size=n_real, max_targets=32)
    want = loss_fn([jnp.asarray(p) for p in preds], jnp.asarray(tg), jnp.asarray(mask))[1]

    # padded batch: row 0 duplicated (loader.pad_final_batch semantics)
    preds_pad = [np.concatenate([p, p[:1].repeat(bs - n_real, 0)]) for p in preds]
    labels_pad = labels + [labels[0]] * (bs - n_real)
    tg_p, mask_p = pad_targets(labels_pad, batch_size=bs, max_targets=48)
    mask_p = mask_p & (tg_p[:, 0] < n_real)
    img_w = (np.arange(bs) < n_real).astype(np.float32)
    got = loss_fn(
        [jnp.asarray(p) for p in preds_pad],
        jnp.asarray(tg_p),
        jnp.asarray(mask_p),
        image_weight=jnp.asarray(img_w),
    )[1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)
