"""Soft-teacher distillation tests."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.data.augment import MultiAugmentationPolicies
from ayolov2_tpu.models import build_model, fuse_params, init_model
from ayolov2_tpu.train.kd_trainer import SoftTeacherTrainer
from ayolov2_tpu.utils.config import load_yaml

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
needs_fixtures = pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixtures unavailable")


def test_strong_augmentation_policies_parse():
    cfg = load_yaml("res/configs/cfg/distillation.yaml")
    pol = MultiAugmentationPolicies(cfg["strong_augmentation"])
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)
    out, lab = pol(img.copy(), labels.copy(), rng)
    assert out.shape == img.shape
    assert lab.shape[1] == 5


def test_affine_transform_keeps_labels_normalized():
    from ayolov2_tpu.data.augment import _affine

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    labels = np.array([[1, 0.5, 0.5, 0.5, 0.5]], np.float32)
    out, lab = _affine(img, labels, rng, scale=[0.8, 1.2], rotate=[-10, 10])
    assert out.shape == img.shape
    if len(lab):
        assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1.0).all()


@needs_fixtures
def test_soft_teacher_one_epoch(tmp_path):
    cfg = load_yaml("res/configs/cfg/distillation.yaml")
    cfg["train"].update(epochs=1, batch_size=4, image_size=64, n_skip=6)

    teacher = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, fused=True, nc=20)
    t_unfused = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    t_vars = fuse_params(init_model(t_unfused, jax.random.PRNGKey(1), img_size=64))

    student = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    s_vars = init_model(student, jax.random.PRNGKey(0), img_size=64)

    common = dict(img_size=64, batch_size=4, stride=32, n_skip=6, label_type="labels")
    labeled = DetectionDataset(VOC_TRAIN, **common)
    unlabeled = DetectionDataset(VOC_TRAIN, **common)
    labeled_loader = DataLoader(labeled, batch_size=4, shuffle=True, drop_last=True)
    unlabeled_loader = DataLoader(unlabeled, batch_size=4, shuffle=True, drop_last=True)

    val_loader = DataLoader(DetectionDataset(VOC_TRAIN, **common), batch_size=4)

    trainer = SoftTeacherTrainer(
        student, {"params": s_vars["params"], "batch_stats": s_vars.get("batch_stats", {})},
        teacher, t_vars, cfg, labeled_loader, unlabeled_loader, val_loader=val_loader,
        log_dir=str(tmp_path), n_devices=4,
    )
    trainer.train()
    assert np.isfinite(trainer.last_items).all()
    assert (tmp_path / "weights" / "last.ckpt").exists()
    # val ran -> best ckpt by mAP50 exists and the state advanced with EMA
    assert (tmp_path / "weights" / "best.ckpt").exists()
    assert int(trainer.state.step) == len(labeled_loader)
    assert int(trainer.state.ema_updates) == len(labeled_loader)


def test_pseudo_label_filtering():
    """Score/size filters (kd_trainer.py filter_invalid parity)."""
    cfg = load_yaml("res/configs/cfg/distillation.yaml")
    cfg["train"].update(epochs=1, batch_size=2, image_size=64)

    teacher = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, fused=True, nc=20)
    t_unfused = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    t_vars = fuse_params(init_model(t_unfused, jax.random.PRNGKey(1), img_size=64))
    student = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    s_vars = init_model(student, jax.random.PRNGKey(0), img_size=64)

    class _FakeLoader:
        max_labels = 16
        def __iter__(self):
            return iter(())
        def __len__(self):
            return 0

    trainer = SoftTeacherTrainer(
        student, {"params": s_vars["params"], "batch_stats": s_vars.get("batch_stats", {})},
        teacher, t_vars, cfg, _FakeLoader(), _FakeLoader(), log_dir="/tmp/kd_test",
    )
    images = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    imgs, targets, mask = trainer.make_pseudo_batch(images)
    # untrained teacher: nothing survives score > 0.9
    assert imgs.shape == images.shape
    assert mask.sum() == 0
