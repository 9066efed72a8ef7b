"""Soft-teacher knowledge distillation trainer.

Parity target: /root/reference/scripts/train/kd_trainer.py:37-586:
  - frozen teacher produces pseudo-labels on unlabeled images via NMS
    (conf 0.4, iou 0.7), filtered to score > 0.9 and box size > 20 px
    (:356-433, filter_invalid :468-491)
  - strong (pixel-level) augmentation applied to the pseudo-labeled images
    before the student sees them
  - student loss = labeled loss + 0.5 * pseudo loss (:167-172)
  - a background thread keeps a pseudo-batch buffer filled (:356-371)
  - full training machinery like the detection trainer (:199-245): 3-group
    optimizer (BN-scale / decayed weights / bias), LambdaLR cosine schedule,
    lr/momentum warmup ramp, gradient accumulation to nbs=64, best/last
    checkpoints carrying optimizer state (:576-586), best by val mAP50
    (:295-309)

TPU-first: teacher forward + NMS is one jitted program; the student step
jits BOTH batches' losses into a single backward (one graph, one optimizer
update + in-step EMA) and runs mesh-sharded over the data axis like
YoloTrainer (batch split across chips; XLA inserts the gradient all-reduce).
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ayolov2_tpu.data.augment import MultiAugmentationPolicies
from ayolov2_tpu.loss.yolo_loss import ComputeLoss, pad_targets
from ayolov2_tpu.ops.nms import batched_nms, detections_to_list
from ayolov2_tpu.parallel import (
    batch_sharding,
    get_mesh,
    host_broadcast_max,
    is_main_process,
    make_global_batch,
    replicate,
    zero_sharding,
)
from ayolov2_tpu.train.optimizer import NBS_NOMINAL, build_optimizer
from ayolov2_tpu.train.train_state import EMA, TrainState, create_train_state
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
        val_loader: optional DataLoader for epoch validation (best-by-mAP50
            checkpointing like the reference KD validator, kd_trainer.py:276-309).
        n_devices: shard the batch over this many devices (None = all).
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
        val_loader=None,
        log_dir: str = "runs/distill/exp",
        model_cfg_dict: Optional[Dict[str, Any]] = None,
        n_devices: Optional[int] = None,
        class_names: Optional[list] = None,
    ) -> None:
        tcfg = cfg["train"]
        super().__init__(epochs=int(tcfg["epochs"]))
        self.student = student
        self.teacher = teacher
        self.teacher_variables = teacher_variables
        self.cfg = cfg
        self.tcfg = tcfg
        self.labeled_loader = labeled_loader
        self.unlabeled_loader = unlabeled_loader
        self.val_loader = val_loader
        self.log_dir = Path(log_dir)
        self.wdir = self.log_dir / "weights"
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.model_cfg_dict = model_cfg_dict
        self.class_names = class_names or [str(i) for i in range(student.nc)]
        self.max_labels = getattr(labeled_loader, "max_labels", 64)
        self.best_score = 0.0

        # opt-in async checkpointing (train.async_ckpt, same as YoloTrainer)
        self._ckpt_writer = None
        if bool(tcfg.get("async_ckpt", False)):
            from ayolov2_tpu.utils.checkpoint import AsyncCheckpointWriter

            self._ckpt_writer = AsyncCheckpointWriter()

        hyp = dict(cfg["hyper_params"])
        hyp["label_smoothing"] = float(tcfg.get("label_smoothing", 0.0))
        self.hyp = scale_hyp_gains(hyp, student.nl, student.nc, int(tcfg["image_size"]))
        from ayolov2_tpu.models.yolo_head import YOLOHead

        head = YOLOHead(nc=student.nc, anchors=student.anchors, strides=student.strides)
        self.loss_fn = ComputeLoss.from_hyp(head.stride_anchors(), student.nc, self.hyp)

        # --- reference KD optimizer machinery (kd_trainer.py:199-245):
        # 3 param groups + warmup + cosine schedule + accumulate to nbs=64
        self.batch_size = int(tcfg["batch_size"])
        accumulate = max(round(NBS_NOMINAL / self.batch_size), 1)
        self.accumulate = accumulate
        self.tx = build_optimizer(
            student_variables["params"],
            self.hyp,
            epochs=self.epochs,
            steps_per_epoch=max(len(labeled_loader), 1),
            batch_size=self.batch_size,
            accumulate=accumulate,
            optimizer=hyp.get("optimizer", "SGD"),
            linear_lr=bool(tcfg.get("linear_lr", False)),
        )

        # --- mesh-sharded jitted KD step (DDP analogue, like YoloTrainer) ---
        devices = jax.devices()[: n_devices or len(jax.devices())]
        self.mesh = get_mesh(devices)
        state = create_train_state(student_variables, self.tx)
        # ZeRO-style student-state sharding (train.fsdp) — same lever as
        # YoloTrainer; the frozen teacher stays replicated (inference-only)
        if bool(tcfg.get("fsdp", False)) and int(self.mesh.shape["data"]) > 1:
            self._state_sharding = zero_sharding(
                self.mesh, state, min_elems=int(tcfg.get("fsdp_min_elems", 65536))
            )
        else:
            self._state_sharding = replicate(self.mesh)
        self.state: TrainState = jax.device_put(state, self._state_sharding)
        image_dtype = jnp.bfloat16 if tcfg.get("half", True) else jnp.float32
        self._image_dtype = image_dtype
        rep, bsh = replicate(self.mesh), batch_sharding(self.mesh, 4)
        multi = jax.process_count() > 1
        tsh = batch_sharding(self.mesh, 2) if multi else rep
        msh = batch_sharding(self.mesh, 1) if multi else rep
        self._student_step = jax.jit(
            self._make_step(image_dtype),
            in_shardings=(self._state_sharding, bsh, tsh, msh, bsh, tsh, msh),
            out_shardings=(self._state_sharding, rep, rep),
        )

        self.strong_aug = (
            MultiAugmentationPolicies(cfg.get("strong_augmentation"))
            if cfg.get("strong_augmentation")
            else None
        )
        self.rng = np.random.default_rng(int(tcfg.get("seed", 0)))

        self._teacher_infer = jax.jit(self._teacher_infer_impl)
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
    def _make_step(self, image_dtype, ema: EMA = EMA()):
        student, loss_fn, tx = self.student, self.loss_fn, self.tx
        w_pseudo = self.PSEUDO_LOSS_WEIGHT

        def step(state: TrainState, imgs_l, tgt_l, mask_l, imgs_u, tgt_u, mask_u):
            x_l = imgs_l.astype(image_dtype) / jnp.asarray(255.0, image_dtype)
            x_u = imgs_u.astype(image_dtype) / jnp.asarray(255.0, image_dtype)

            def compute(p):
                raw_l, mut = student.apply(
                    {"params": p, "batch_stats": state.batch_stats}, x_l,
                    training=True, mutable=["batch_stats"],
                )
                loss_l, items_l = loss_fn(raw_l, tgt_l, mask_l)
                raw_u, mut2 = student.apply(
                    {"params": p, "batch_stats": mut["batch_stats"]}, x_u,
                    training=True, mutable=["batch_stats"],
                )
                loss_u, items_u = loss_fn(raw_u, tgt_u, mask_u)
                total = loss_l + w_pseudo * loss_u  # kd_trainer.py:172
                return total, (mut2["batch_stats"], items_l, items_u)

            (_, (new_stats, items_l, items_u)), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema_updates = state.ema_updates + 1
            new_state = state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                ema_params=ema.update(state.ema_params, new_params, new_ema_updates),
                ema_batch_stats=ema.update(state.ema_batch_stats, new_stats, new_ema_updates),
                ema_updates=new_ema_updates,
                step=state.step + 1,
            )
            return new_state, items_l, items_u

        return step

    # -- lifecycle ---------------------------------------------------------
    def on_train_start(self) -> None:
        self._producer_thread = threading.Thread(target=self._pseudo_producer, daemon=True)
        self._producer_thread.start()

    def epoch_iterator(self):
        return self.labeled_loader

    def training_step(self, batch, batch_idx: int) -> Dict[str, float]:
        imgs_u, tgt_u, mask_u = self._pseudo_q.get()
        il, tl, ml = make_global_batch(self.mesh, batch.images, batch.targets, batch.target_mask)
        iu, tu, mu = make_global_batch(self.mesh, imgs_u, tgt_u, mask_u)
        self.state, items_l, items_u = self._student_step(
            self.state, jnp.asarray(il), jnp.asarray(tl), jnp.asarray(ml),
            jnp.asarray(iu), jnp.asarray(tu), jnp.asarray(mu),
        )
        if batch_idx % 20 == 0:
            self.last_items = np.asarray(items_l)
            LOGGER.info(
                "epoch %3d step %4d  labeled %.4f  pseudo %.4f",
                self.current_epoch, batch_idx,
                float(np.asarray(items_l)[3]), float(np.asarray(items_u)[3]),
            )
        return {}

    def on_preempt(self) -> None:
        # mid-epoch SIGTERM (single-process path): persist the student state;
        # the partial epoch stamps the previous one so resume re-runs it
        # (ADVICE r4 #2, same semantics as YoloTrainer)
        if is_main_process():
            self._save_weights("last.ckpt")

    def _gather_state_for_ckpt(self):
        """Replicate fsdp-sharded student state for a layout-independent
        checkpoint. COLLECTIVE in multi-process runs — every host must
        execute it before any host-0-gated save (ADVICE r4 #1)."""
        if not bool(self.tcfg.get("fsdp", False)):
            return self.state
        return jax.device_put(self.state, replicate(self.mesh))

    def validation(self) -> None:
        if jax.process_count() > 1:
            # all hosts join the checkpoint gather BEFORE the rank gate —
            # the saves below are host-0-only and must not trigger a
            # collective on their own (ADVICE r4 #1)
            self._ckpt_state = self._gather_state_for_ckpt()
            # KD has no early stopping upstream — preemption is the only
            # stop source; fold it into an all-hosts max so every host
            # leaves the collective epoch loop together
            if host_broadcast_max(self.mesh, 1.0 if self.is_preempted else 0.0) > 0:
                self.is_early_stop = True
        try:
            self._validation_main()
        finally:
            self._ckpt_state = None

    def _validation_main(self) -> None:
        if not is_main_process():
            return  # host-0-only val/ckpt (kd_trainer.py rank gating)
        if self.val_loader is None:
            self._save_weights("last.ckpt")
            return
        from ayolov2_tpu.eval import YoloValidator

        variables = {"params": self.state.ema_params, "batch_stats": self.state.ema_batch_stats}
        if jax.process_count() > 1:
            variables = jax.device_get(variables)
        if getattr(self, "_validator", None) is None:
            self._validator = YoloValidator(
                self.student, variables, self.val_loader,
                class_names=self.class_names,
                cfg={"half": bool(self.tcfg.get("half", True))},
            )
        self._validator.variables = variables
        result = self._validator.validation()
        map50 = result["map50"]
        self.log_dict({"mAP50": map50, "mAP50_95": result["map50_95"]})
        if map50 >= self.best_score:
            self.best_score = map50
            self._save_weights("best.ckpt", map50=map50)
        self._save_weights("last.ckpt", map50=map50)

    def on_train_end(self) -> None:
        self._stop.set()
        # drain so the producer can observe the stop flag
        while not self._pseudo_q.empty():
            self._pseudo_q.get_nowait()
        if jax.process_count() > 1:
            self._ckpt_state = self._gather_state_for_ckpt()  # collective, all hosts
        if is_main_process():
            self._save_weights("last.ckpt")
        self._ckpt_state = None
        if self._ckpt_writer is not None:
            self._ckpt_writer.wait()

    def _save_weights(self, name: str, map50: Optional[float] = None) -> None:
        # multi-process saves use the all-hosts pre-gathered state
        # (validation/on_train_end); single-process gathers locally
        state = (
            self._ckpt_state if getattr(self, "_ckpt_state", None) is not None
            else self._gather_state_for_ckpt()
        )
        epoch = self.current_epoch - 1 if self.partial_epoch else self.current_epoch
        best_score, model_cfg = self.best_score, self.model_cfg_dict

        def _write(path=self.wdir / name, state=state):
            save_checkpoint(
                path, state, epoch=epoch, best_score=best_score,
                map50=map50, model_cfg=model_cfg,
            )

        if self._ckpt_writer is not None:
            self._ckpt_writer.submit(_write)
        else:
            _write()
