"""Plotting: boxes, label histograms, batch mosaics, PR/metric curves.

Parity target: /root/reference/scripts/utils/plot_utils.py:40-386
(plot_one_box, plot_label_histogram, plot_images batch mosaics, draw_labels,
plot_pr_curve, plot_mc_curve) and the ConfusionMatrix heatmap
(scripts/utils/metrics.py:237-277). All host-side; matplotlib Agg backend.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import cv2
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ayolov2_tpu.utils.boxes import xywh2xyxy  # noqa: E402
from ayolov2_tpu.utils.constants import PLOT_COLORS  # noqa: E402


def color_for(idx: int) -> tuple:
    c = PLOT_COLORS[int(idx) % len(PLOT_COLORS)]
    return tuple(int(v) for v in c)


def plot_one_box(
    img: np.ndarray,
    box: Sequence[float],
    label: Optional[str] = None,
    color: Optional[tuple] = None,
    line_thickness: Optional[int] = None,
) -> None:
    """Draw one xyxy box (+label) in place (plot_utils.py:40-78)."""
    tl = line_thickness or max(round(0.002 * (img.shape[0] + img.shape[1]) / 2), 1)
    color = color or (128, 128, 128)
    c1, c2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
    cv2.rectangle(img, c1, c2, color, thickness=tl, lineType=cv2.LINE_AA)
    if label:
        tf = max(tl - 1, 1)
        t_size = cv2.getTextSize(label, 0, fontScale=tl / 3, thickness=tf)[0]
        c2 = c1[0] + t_size[0], c1[1] - t_size[1] - 3
        cv2.rectangle(img, c1, c2, color, -1, cv2.LINE_AA)
        cv2.putText(img, label, (c1[0], c1[1] - 2), 0, tl / 3, (225, 255, 255),
                    thickness=tf, lineType=cv2.LINE_AA)


def draw_labels(
    img: np.ndarray,
    labels: np.ndarray,
    names: Optional[Sequence[str]] = None,
    norm_xywh: bool = True,
) -> np.ndarray:
    """Overlay (n, 5) [cls, box] labels on an image copy (plot_utils draw_labels)."""
    out = img.copy()
    h, w = out.shape[:2]
    for lab in np.asarray(labels).reshape(-1, 5):
        cls = int(lab[0])
        box = xywh2xyxy(lab[1:] * np.array([w, h, w, h], np.float32)) if norm_xywh else lab[1:]
        name = names[cls] if names and cls < len(names) else str(cls)
        plot_one_box(out, box, label=name, color=color_for(cls))
    return out


def plot_label_histogram(labels: List[np.ndarray], nc: int, save_path: Union[str, Path]) -> None:
    """Class histogram + box wh scatter (plot_utils.py:79-118)."""
    alls = np.concatenate([lab for lab in labels if len(lab)], 0) if labels else np.zeros((0, 5))
    fig, axes = plt.subplots(1, 2, figsize=(12, 5), tight_layout=True)
    axes[0].hist(alls[:, 0], bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0].set_xlabel("class")
    axes[0].set_ylabel("instances")
    axes[1].scatter(alls[:, 3], alls[:, 4], s=3, alpha=0.3)
    axes[1].set_xlabel("width")
    axes[1].set_ylabel("height")
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def plot_images(
    images: np.ndarray,
    targets: np.ndarray,
    target_mask: Optional[np.ndarray],
    save_path: Union[str, Path],
    names: Optional[Sequence[str]] = None,
    max_images: int = 16,
) -> None:
    """Batch mosaic with GT overlays (plot_utils.py:123-237 plot_images).

    images: (B, H, W, 3) uint8; targets: (M, 6) [img, cls, xywh-norm].
    """
    bs = min(len(images), max_images)
    ns = int(np.ceil(bs ** 0.5))
    h, w = images.shape[1:3]
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    targets = np.asarray(targets)
    if target_mask is not None:
        targets = targets[np.asarray(target_mask)]
    for i in range(bs):
        r, c = divmod(i, ns)
        tile = images[i].copy()
        rows = targets[targets[:, 0] == i]
        if len(rows):
            tile = draw_labels(tile, rows[:, 1:], names)
        mosaic[r * h : (r + 1) * h, c * w : (c + 1) * w] = tile
    cv2.imwrite(str(save_path), mosaic)


def plot_pr_curve(
    px: np.ndarray, py: np.ndarray, ap: np.ndarray, save_path: Union[str, Path],
    names: Sequence[str] = (),
) -> None:
    """Per-class PR curves + mean (plot_utils.py:302-340)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if isinstance(py, list) else py
    if 0 < len(names) < 21:
        for i in range(py.shape[1]):
            ax.plot(px, py[:, i], linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
        ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize=7)
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    ax.plot(px, py.mean(1), linewidth=3, color="blue",
            label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    fig.savefig(save_path, dpi=200)
    plt.close(fig)


def plot_mc_curve(
    px: np.ndarray, py: np.ndarray, save_path: Union[str, Path],
    names: Sequence[str] = (), xlabel: str = "Confidence", ylabel: str = "Metric",
) -> None:
    """Metric-vs-confidence curves (F1/P/R; plot_utils.py:343-386)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=names[i])
        ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize=7)
    else:
        ax.plot(px, np.asarray(py).T, linewidth=1, color="grey")
    y = np.asarray(py).mean(0)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    fig.savefig(save_path, dpi=200)
    plt.close(fig)


def plot_confusion_matrix(
    matrix: np.ndarray, save_path: Union[str, Path], names: Sequence[str] = ()
) -> None:
    """Normalized confusion-matrix heatmap (metrics.py:237-277)."""
    nc = matrix.shape[0] - 1
    arr = matrix / (matrix.sum(0).reshape(1, -1) + 1e-6)
    arr[arr < 0.005] = np.nan
    fig, ax = plt.subplots(1, 1, figsize=(10, 8), tight_layout=True)
    im = ax.imshow(arr, cmap="Blues", vmin=0.0, vmax=1.0)
    fig.colorbar(im)
    ticks = list(names) + ["background"] if 0 < len(names) < 100 else None
    if ticks and len(ticks) == nc + 1:
        ax.set_xticks(range(nc + 1))
        ax.set_yticks(range(nc + 1))
        ax.set_xticklabels(ticks, rotation=90, fontsize=6)
        ax.set_yticklabels(ticks, fontsize=6)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
