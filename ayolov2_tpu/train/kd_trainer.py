"""Soft-teacher knowledge distillation trainer.

Parity target: /root/reference/scripts/train/kd_trainer.py:37-586:
  - frozen teacher produces pseudo-labels on unlabeled images via NMS
    (conf 0.4, iou 0.7), filtered to score > 0.9 and box size > 20 px
    (:356-433, filter_invalid :468-491)
  - strong (pixel/affine-free here: pixel-level) augmentation applied to
    the pseudo-labeled images before the student sees them
  - student loss = labeled loss + 0.5 * pseudo loss (:167-172)
  - a background thread keeps a pseudo-batch buffer filled (:356-371)

TPU-first: teacher forward + NMS is one jitted program; the student step
jits BOTH batches' losses into a single backward (one graph, one optimizer
update); loaders shard per host.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ayolov2_tpu.data.augment import MultiAugmentationPolicies
from ayolov2_tpu.loss.yolo_loss import ComputeLoss, pad_targets
from ayolov2_tpu.ops.nms import batched_nms, detections_to_list
from ayolov2_tpu.train.trainer import AbstractTrainer, scale_hyp_gains
from ayolov2_tpu.utils.boxes import xyxy2xywh
from ayolov2_tpu.utils.checkpoint import save_checkpoint
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


class SoftTeacherTrainer(AbstractTrainer):
    """Distill a frozen teacher into a student with pseudo-labels.

    Args:
        student / student_variables: the model being trained.
        teacher / teacher_variables: the frozen pseudo-labeler (eval graph).
        cfg: train config (train / hyper_params / strong_augmentation).
        labeled_loader: DataLoader over the labeled DetectionDataset.
        unlabeled_loader: DataLoader over an image-only dataset (detection
            batches with empty labels work too).
    """

    PSEUDO_LOSS_WEIGHT = 0.5  # kd_trainer.py:93
    PSEUDO_CONF = 0.4
    PSEUDO_IOU = 0.7
    PSEUDO_SCORE_THR = 0.9  # kd_trainer.py get_pseudo_labeled_batch
    PSEUDO_MIN_SIZE = 20.0

    def __init__(
        self,
        student,
        student_variables: Dict[str, Any],
        teacher,
        teacher_variables: Dict[str, Any],
        cfg: Dict[str, Any],
        labeled_loader,
        unlabeled_loader,
        log_dir: str = "runs/distill/exp",
        model_cfg_dict: Optional[Dict[str, Any]] = None,
    ) -> None:
        from pathlib import Path

        tcfg = cfg["train"]
        super().__init__(epochs=int(tcfg["epochs"]))
        self.student = student
        self.teacher = teacher
        self.teacher_variables = teacher_variables
        self.cfg = cfg
        self.tcfg = tcfg
        self.labeled_loader = labeled_loader
        self.unlabeled_loader = unlabeled_loader
        self.log_dir = Path(log_dir)
        self.wdir = self.log_dir / "weights"
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.model_cfg_dict = model_cfg_dict
        self.max_labels = getattr(labeled_loader, "max_labels", 64)

        hyp = dict(cfg["hyper_params"])
        hyp["label_smoothing"] = float(tcfg.get("label_smoothing", 0.0))
        self.hyp = scale_hyp_gains(hyp, student.nl, student.nc, int(tcfg["image_size"]))
        from ayolov2_tpu.models.yolo_head import YOLOHead

        head = YOLOHead(nc=student.nc, anchors=student.anchors, strides=student.strides)
        self.loss_fn = ComputeLoss.from_hyp(head.stride_anchors(), student.nc, self.hyp)

        opt = hyp.get("optimizer_params", {})
        self.tx = optax.sgd(
            float(opt.get("lr", 0.01)),
            momentum=float(opt.get("momentum", 0.937)),
            nesterov=bool(opt.get("nesterov", True)),
        )
        self.params = student_variables["params"]
        self.batch_stats = student_variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

        self.strong_aug = (
            MultiAugmentationPolicies(cfg.get("strong_augmentation"))
            if cfg.get("strong_augmentation")
            else None
        )
        self.rng = np.random.default_rng(int(tcfg.get("seed", 0)))

        self._teacher_infer = jax.jit(self._teacher_infer_impl)
        self._student_step = jax.jit(self._student_step_impl)
        self._pseudo_q: "queue.Queue" = queue.Queue(maxsize=4)
        self._stop = threading.Event()
        self.last_items = np.zeros(4)

    # -- teacher ------------------------------------------------------------
    def _teacher_infer_impl(self, images: jax.Array):
        imgs = images.astype(jnp.float32) / 255.0
        decoded, _ = self.teacher.apply(self.teacher_variables, imgs, training=False)
        return batched_nms(
            decoded.astype(jnp.float32),
            conf_thres=self.PSEUDO_CONF,
            iou_thres=self.PSEUDO_IOU,
            nms_box=1000,
            pre_top_k=256,
            keep_top_k=64,
            multi_label=False,
        )

    def make_pseudo_batch(self, images: np.ndarray):
        """Teacher NMS -> filter (score/size) -> strong augment -> targets."""
        det, n_valid = self._teacher_infer(jnp.asarray(images))
        dets = detections_to_list(np.asarray(det), np.asarray(n_valid))
        h, w = images.shape[1:3]
        out_imgs, labels = [], []
        for i, d in enumerate(dets):
            keep = (d[:, 4] > self.PSEUDO_SCORE_THR)
            keep &= (d[:, 2] - d[:, 0] > self.PSEUDO_MIN_SIZE) & (d[:, 3] - d[:, 1] > self.PSEUDO_MIN_SIZE)
            d = d[keep]
            img = images[i]
            lab = np.zeros((len(d), 5), np.float32)
            if len(d):
                lab[:, 0] = d[:, 5]
                lab[:, 1:] = xyxy2xywh(d[:, :4], wh=(w, h), clip_eps=1e-3)
            if self.strong_aug is not None:
                img, lab = self.strong_aug(img.copy(), lab, self.rng)
            out_imgs.append(np.ascontiguousarray(img))
            labels.append(lab)
        targets, mask = pad_targets(labels, len(out_imgs), len(out_imgs) * self.max_labels)
        return np.stack(out_imgs), targets, mask

    def _pseudo_producer(self) -> None:
        while not self._stop.is_set():
            for batch in self.unlabeled_loader:
                if self._stop.is_set():
                    return
                self._pseudo_q.put(self.make_pseudo_batch(batch.images))

    # -- student --------------------------------------------------------------
    def _student_step_impl(
        self, params, batch_stats, opt_state,
        imgs_l, tgt_l, mask_l, imgs_u, tgt_u, mask_u,
    ):
        x_l = imgs_l.astype(jnp.float32) / 255.0
        x_u = imgs_u.astype(jnp.float32) / 255.0

        def compute(p):
            raw_l, mut = self.student.apply(
                {"params": p, "batch_stats": batch_stats}, x_l,
                training=True, mutable=["batch_stats"],
            )
            loss_l, items_l = self.loss_fn(raw_l, tgt_l, mask_l)
            raw_u, mut2 = self.student.apply(
                {"params": p, "batch_stats": mut["batch_stats"]}, x_u,
                training=True, mutable=["batch_stats"],
            )
            loss_u, items_u = self.loss_fn(raw_u, tgt_u, mask_u)
            total = loss_l + self.PSEUDO_LOSS_WEIGHT * loss_u  # kd_trainer.py:172
            return total, (mut2["batch_stats"], items_l, items_u)

        (_, (new_stats, items_l, items_u)), grads = jax.value_and_grad(compute, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, items_l, items_u

    # -- lifecycle ---------------------------------------------------------
    def on_train_start(self) -> None:
        self._producer_thread = threading.Thread(target=self._pseudo_producer, daemon=True)
        self._producer_thread.start()

    def epoch_iterator(self):
        return self.labeled_loader

    def training_step(self, batch, batch_idx: int) -> Dict[str, float]:
        imgs_u, tgt_u, mask_u = self._pseudo_q.get()
        self.params, self.batch_stats, self.opt_state, items_l, items_u = self._student_step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(batch.images), jnp.asarray(batch.targets), jnp.asarray(batch.target_mask),
            jnp.asarray(imgs_u), jnp.asarray(tgt_u), jnp.asarray(mask_u),
        )
        if batch_idx % 20 == 0:
            self.last_items = np.asarray(items_l)
            LOGGER.info(
                "epoch %3d step %4d  labeled %.4f  pseudo %.4f",
                self.current_epoch, batch_idx,
                float(np.asarray(items_l)[3]), float(np.asarray(items_u)[3]),
            )
        return {}

    def validation(self) -> None:
        self._save("last.ckpt")

    def on_train_end(self) -> None:
        self._stop.set()
        # drain so the producer can observe the stop flag
        while not self._pseudo_q.empty():
            self._pseudo_q.get_nowait()
        self._save("last.ckpt")

    def _save(self, name: str) -> None:
        class _S:  # save_checkpoint state shim
            pass

        s = _S()
        s.params = self.params
        s.batch_stats = self.batch_stats
        s.ema_params = self.params
        s.ema_batch_stats = self.batch_stats
        s.ema_updates = jnp.zeros((), jnp.int32)
        s.step = jnp.zeros((), jnp.int32)
        s.opt_state = self.opt_state
        save_checkpoint(self.wdir / name, s, epoch=self.current_epoch, model_cfg=self.model_cfg_dict)
