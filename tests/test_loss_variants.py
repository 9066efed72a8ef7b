"""Focal/QFocal/BCEBlur loss variants + disk image caching tests."""

import shutil
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.loss.yolo_loss import (
    ComputeLoss,
    _bce_blur_scale,
    _focal_scale,
    _qfocal_scale,
)

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
needs_fixtures = pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixtures unavailable")

ANCHORS = np.array(
    [[[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
     [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
     [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]]], np.float32
)


def _loss_inputs(bs=2, nc=20, seed=0):
    rng = np.random.default_rng(seed)
    preds = [
        jnp.asarray(rng.standard_normal((bs, s, s, 3, nc + 5)).astype(np.float32))
        for s in (8, 4, 2)
    ]
    targets = np.zeros((bs * 4, 6), np.float32)
    mask = np.zeros(bs * 4, bool)
    for i in range(bs):
        targets[i] = [i, i % nc, 0.5, 0.5, 0.25, 0.3]
        mask[i] = True
    return preds, jnp.asarray(targets), jnp.asarray(mask)


def _hyp(**kw):
    h = {"box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
         "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0}
    h.update(kw)
    return h


def test_focal_scales_shapes_and_ranges():
    logits = jnp.asarray(np.linspace(-5, 5, 11), jnp.float32)
    targets = jnp.asarray(np.round(np.linspace(0, 1, 11)), jnp.float32)
    for fn in (_focal_scale, _qfocal_scale):
        s = fn(logits, targets, gamma=1.5)
        assert s.shape == logits.shape
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    b = _bce_blur_scale(logits, targets)
    assert float(b.min()) >= 0.0 and float(b.max()) <= 1.0


def test_loss_variants_all_finite_and_differ():
    preds, targets, mask = _loss_inputs()
    base = ComputeLoss.from_hyp(ANCHORS, 20, _hyp())
    focal = ComputeLoss.from_hyp(ANCHORS, 20, _hyp(fl_gamma=1.5))
    qfocal = ComputeLoss.from_hyp(ANCHORS, 20, _hyp(fl_gamma=1.5, focal_type="qfocal"))
    blur = ComputeLoss.from_hyp(ANCHORS, 20, _hyp(focal_type="bce_blur"))

    vals = {}
    for name, fn in [("base", base), ("focal", focal), ("qfocal", qfocal), ("blur", blur)]:
        total, items = fn(preds, targets, mask)
        items = np.asarray(items)
        assert np.isfinite(items).all(), (name, items)
        vals[name] = items[3]
    # modulations must actually change the loss
    assert vals["focal"] != vals["base"]
    assert vals["qfocal"] != vals["focal"]
    assert vals["blur"] != vals["base"]


def test_loss_variants_gradients_flow():
    preds, targets, mask = _loss_inputs()
    loss_fn = ComputeLoss.from_hyp(ANCHORS, 20, _hyp(fl_gamma=1.5, focal_type="qfocal"))
    g = jax.grad(lambda p: loss_fn(p, targets, mask)[0])(preds)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert any(float(jnp.abs(x).max()) > 0 for x in g)


@needs_fixtures
def test_disk_image_cache(tmp_path):
    from ayolov2_tpu.data.datasets import ImageFolderDataset

    img_dir = tmp_path / "images" / "train"
    img_dir.mkdir(parents=True)
    for f in sorted(Path(VOC_TRAIN).glob("*.jpg"))[:4]:
        shutil.copy(f, img_dir / f.name)

    ds = ImageFolderDataset(img_dir, img_size=64, batch_size=2, cache_images="disk")
    im1, orig1, _ = ds.load_image(0)
    assert list(img_dir.glob("*.ayolo.npy")), "npy cache not written"
    im2, orig2, _ = ds.load_image(0)  # served from disk cache
    np.testing.assert_array_equal(im1, im2)
    assert orig1 == tuple(orig2) or orig1 == orig2

    # self-healing: corrupt npy falls back to re-reading the image
    npy = next(iter(img_dir.glob("*.ayolo.npy")))
    npy.write_bytes(b"garbage")
    im3, _, _ = ds.load_image(0)
    np.testing.assert_array_equal(im1, im3)
