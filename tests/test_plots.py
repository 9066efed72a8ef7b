"""Plot + wandb-stub + model-variant tests."""

from pathlib import Path

import numpy as np
import pytest

from ayolov2_tpu.utils.plots import (
    draw_labels,
    plot_confusion_matrix,
    plot_images,
    plot_label_histogram,
    plot_mc_curve,
    plot_one_box,
    plot_pr_curve,
)


def test_plot_one_box_and_draw_labels():
    img = np.zeros((64, 64, 3), np.uint8)
    plot_one_box(img, [8, 8, 32, 32], label="cat", color=(0, 255, 0))
    assert img.sum() > 0
    out = draw_labels(np.zeros((64, 64, 3), np.uint8),
                      np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32), ["a", "b"])
    assert out.sum() > 0


def test_plot_files(tmp_path):
    rng = np.random.default_rng(0)
    labels = [np.array([[i % 3, 0.5, 0.5, 0.2, 0.3]], np.float32) for i in range(10)]
    plot_label_histogram(labels, nc=3, save_path=tmp_path / "hist.png")

    images = rng.integers(0, 255, (4, 32, 32, 3), np.uint8)
    targets = np.array([[0, 1, 0.5, 0.5, 0.4, 0.4], [2, 0, 0.3, 0.3, 0.2, 0.2]], np.float32)
    plot_images(images, targets, None, tmp_path / "batch.png", names=["a", "b"])

    px = np.linspace(0, 1, 1000)
    py = np.stack([1 - px, 1 - px * 0.5], 1)
    ap = np.array([[0.5] * 10, [0.7] * 10])
    plot_pr_curve(px, py, ap, tmp_path / "pr.png", names=["a", "b"])
    plot_mc_curve(px, py.T, tmp_path / "f1.png", names=["a", "b"], ylabel="F1")

    m = np.zeros((4, 4))
    m[0, 0] = 10; m[1, 1] = 5; m[3, 2] = 2
    plot_confusion_matrix(m, tmp_path / "cm.png", names=["a", "b", "c"])

    for f in ("hist.png", "batch.png", "pr.png", "f1.png", "cm.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_ap_per_class_plot_integration(tmp_path):
    from ayolov2_tpu.utils.metrics import ap_per_class

    rng = np.random.default_rng(0)
    n = 200
    tp = rng.random((n, 10)) > 0.4
    conf = rng.random(n)
    pcls = rng.integers(0, 3, n)
    tcls = rng.integers(0, 3, 100)
    p, r, ap, f1, classes = ap_per_class(
        tp, conf, pcls, tcls, plot=True, save_dir=tmp_path, names=["a", "b", "c"]
    )
    assert (tmp_path / "PR_curve.png").exists()
    assert (tmp_path / "F1_curve.png").exists()


def test_wandb_stub_degrades_gracefully():
    from ayolov2_tpu.utils.wandb_utils import (
        get_ckpt_path,
        init_run,
        is_wandb_path,
        wandb_available,
    )

    assert not wandb_available()  # not in this image
    assert init_run() is None
    assert is_wandb_path("j-marple/AYolov2/1gxaqgk4")
    assert not is_wandb_path("res/configs/model/yolov5s.yaml")
    assert get_ckpt_path("res/configs/model/yolov5s.yaml") == "res/configs/model/yolov5s.yaml"
