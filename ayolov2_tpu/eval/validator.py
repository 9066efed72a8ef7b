"""Full validation loop — the reference YoloValidator, TPU-first.

Parity target: /root/reference/scripts/utils/train_utils.py:136-609:
  - per-batch: preprocess timing, forward (or TTA), optional loss on raw
    maps, NMS, per-image TP matrix at IoU 0.5:0.95, de-letterboxing to
    native coordinates, speed report (pre / inference / NMS ms per image)
  - rollup: ap_per_class -> (mp, mr, map50, map), per-class table
  - hybrid-label NMS injection (metrics.py:341-348)

TPU-first deltas:
  - forward + decode + NMS run as fixed-shape jitted device programs; the
    only D2H copy per batch is the (bs, max_det, 6) detections + counts.
  - bf16 compute by default (the reference's --half fp16 analogue).
  - TTA branches compile into one program (ops/tta.py).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.loss.yolo_loss import ComputeLoss
from ayolov2_tpu.ops.nms import batched_nms, detections_to_list
from ayolov2_tpu.ops.tta import inference_with_tta
from ayolov2_tpu.utils.boxes import scale_coords, xywh2xyxy
from ayolov2_tpu.utils.logger import get_logger
from ayolov2_tpu.utils.metrics import IOUV, ap_per_class, process_batch

LOGGER = get_logger(__name__)


class YoloValidator:
    """Runs mAP validation of a detection model over a DataLoader.

    Args:
        model: YOLOModel (training=False apply -> (decoded, raw)).
        variables: {'params', 'batch_stats'} pytree to evaluate.
        loader: DataLoader over a DetectionDataset (rect val loader).
        class_names: nc names for the per-class report.
        cfg: validation params — conf_t, iou_t, nms_type, single_cls,
            max_det, pre_top_k, nms_box, tta, hybrid_label, half.
        compute_loss: optional ComputeLoss to accumulate val loss
            (train-time validation cadence, yolo_trainer.py:392-433).
    """

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        loader,
        class_names: Optional[Sequence[str]] = None,
        cfg: Optional[Dict[str, Any]] = None,
        compute_loss: Optional[ComputeLoss] = None,
        detection_fn: Optional[Callable] = None,
    ) -> None:
        """``detection_fn``: an images -> (detections, counts) callable (e.g.
        a loaded export artifact) used INSTEAD of forward+NMS — the analogue
        of validating a TRT engine with fixed outputs (val.py:241-278 +
        convert_trt_out, train_utils.py:262-283)."""
        cfg = dict(cfg or {})
        self.model = model
        self.variables = variables
        self.loader = loader
        self.detection_fn = detection_fn
        nc_src = model.nc if model is not None else int(cfg.get("nc", 80))
        self.nc = 1 if cfg.get("single_cls") else nc_src
        self.names = list(class_names) if class_names else [str(i) for i in range(self.nc)]
        self.compute_loss = compute_loss

        self.conf_t = float(cfg.get("conf_t", 0.001))
        self.iou_t = float(cfg.get("iou_t", 0.65))
        self.nms_type = cfg.get("nms_type", "nms")
        self.single_cls = bool(cfg.get("single_cls", False))
        self.max_det = int(cfg.get("max_det", 300))
        self.pre_top_k = int(cfg.get("pre_top_k", 512))
        self.nms_box = int(cfg.get("nms_box", 1000))
        self.tta = bool(cfg.get("tta", False))
        # TTA scale/flip schedule (reference res/configs/cfg/tta.yaml via
        # val.py --tta-cfg); None = ops/tta.py defaults
        self.tta_scales = cfg.get("tta_scales")
        self.tta_flips = cfg.get("tta_flips")
        self.hybrid_label = bool(cfg.get("hybrid_label", False))
        self.image_dtype = jnp.bfloat16 if cfg.get("half", True) else jnp.float32
        self.verbose = bool(cfg.get("verbose", False))
        self.plot_dir = cfg.get("plot_dir")  # PR/F1/P/R curve output dir
        self.confusion = None
        if cfg.get("confusion_matrix") or self.plot_dir:
            from ayolov2_tpu.utils.metrics import ConfusionMatrix

            self.confusion = ConfusionMatrix(self.nc)

        # Through the tunneled "axon" backend block_until_ready returns
        # before device completion — only a D2H read is a true barrier
        # (bench.py methodology). Phase timings use a 1-element readback
        # there so the reported pre/infer/NMS ms/img is honest; on direct
        # backends block_until_ready is a real barrier and stays free.
        self._tunneled = "axon" in str(getattr(jax.config, "jax_platforms", "") or "")

        self._forward = jax.jit(self._forward_impl) if model is not None else None
        self._nms = None  # built lazily once prediction width is known
        # fused decode+NMS serving path: usable when the loop needs no raw
        # maps (no loss), no TTA, and no hybrid-label injection — decodes
        # only the obj-prefiltered candidates (ops/nms.fused_decode_nms)
        self.use_fused = (
            bool(cfg.get("fused", True))
            and model is not None
            and getattr(model, "fused", False)  # BN folded: raw maps need no
            # batch_stats mutation; unfused eval must use running averages
            # via the training=False (decode-all) path
            and compute_loss is None
            and not self.tta
            and not self.hybrid_label
            and self.nms_type in ("nms", "batched_nms")
        )
        self._fused_cache: Dict[Tuple[int, int], Callable] = {}

    def _fused_step(self, hw: Tuple[int, int]) -> Callable:
        """One jitted forward+decode+NMS program per letterbox shape."""
        if hw not in self._fused_cache:
            from ayolov2_tpu.models.yolo_head import YOLOHead
            from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

            head = YOLOHead(nc=self.model.nc, anchors=self.model.anchors, strides=self.model.strides)
            grid_xy, anchor_wh, stride = (
                jnp.asarray(v) for v in flat_grid_meta(self.model.strides, head.anchor_grid(), hw)
            )

            @jax.jit
            def step(variables, images):
                imgs = images.astype(self.image_dtype) / jnp.asarray(255.0, self.image_dtype)
                raw = self.model.apply(variables, imgs, training=True)
                return fused_decode_nms(
                    flatten_raw_maps(raw), grid_xy, anchor_wh, stride,
                    conf_thres=self.conf_t, iou_thres=self.iou_t,
                    nms_box=self.nms_box, pre_top_k=self.pre_top_k,
                    keep_top_k=self.max_det, agnostic=self.single_cls,
                    multi_label=self.nc > 1, nms_type="nms",
                )

            self._fused_cache[hw] = step
        return self._fused_cache[hw]

    # ---- device programs -------------------------------------------------

    def _forward_impl(self, variables, images: jax.Array):
        # variables are a traced ARGUMENT (not a closure capture): a closure
        # would bake the weights into the compiled program and silently
        # ignore per-epoch EMA updates when the validator is reused
        imgs = images.astype(self.image_dtype) / jnp.asarray(255.0, self.image_dtype)
        if self.tta:
            def fwd(x):
                decoded, _ = self.model.apply(variables, x, training=False)
                return decoded.astype(jnp.float32)

            kw = {}
            if self.tta_scales is not None:
                kw["scales"] = tuple(self.tta_scales)
            if self.tta_flips is not None:
                kw["flips"] = tuple(self.tta_flips)
            pred = inference_with_tta(fwd, imgs, nl=self.model.nl, gs=int(max(self.model.stride)), **kw)
            return pred, None
        decoded, raw = self.model.apply(variables, imgs, training=False)
        return decoded.astype(jnp.float32), [r.astype(jnp.float32) for r in raw]

    @partial(jax.jit, static_argnums=(0,))
    def _inject_labels(self, pred: jax.Array, targets: jax.Array, mask: jax.Array, wh: jax.Array):
        """Hybrid-label NMS: append GT rows as perfect detections on device.

        Parity: metrics.py:341-348 — label rows (img, cls, xywh-norm) become
        candidates with obj=1, onehot cls=1 before suppression.
        """
        bs, _, no = pred.shape
        m = targets.shape[0]
        per_img = m // bs
        rows = jnp.zeros((m, no), jnp.float32)
        rows = rows.at[:, :4].set(targets[:, 2:6] * jnp.tile(wh, 2)[None, :])
        rows = rows.at[:, 4].set(1.0)
        cls_idx = jnp.clip(targets[:, 1].astype(jnp.int32), 0, no - 6)
        rows = rows.at[jnp.arange(m), 5 + cls_idx].set(1.0)
        rows = jnp.where(mask[:, None], rows, 0.0)
        # scatter rows into their image's slot block; padding rows route to a
        # scratch image (index bs) so they can't clobber real slots
        img_idx = jnp.where(mask, targets[:, 0].astype(jnp.int32), bs)
        extra = jnp.zeros((bs + 1, per_img, no), jnp.float32)
        order = jnp.argsort(img_idx, stable=True)
        rows_sorted = rows[order]
        img_sorted = img_idx[order]
        pos = jnp.arange(m) - jnp.searchsorted(img_sorted, img_sorted, side="left")
        extra = extra.at[img_sorted, jnp.clip(pos, 0, per_img - 1)].set(rows_sorted)
        return jnp.concatenate([pred, extra[:bs]], axis=1)

    def _run_nms(self, pred: jax.Array, multi_label: bool = True):
        return batched_nms(
            pred,
            conf_thres=self.conf_t,
            iou_thres=self.iou_t,
            nms_box=min(self.nms_box, pred.shape[1]),
            pre_top_k=min(self.pre_top_k, pred.shape[1]),
            keep_top_k=self.max_det,
            agnostic=self.single_cls,
            multi_label=multi_label and self.nc > 1,
            nms_type=self.nms_type if self.nms_type != "batched_nms" else "nms",
        )

    # ---- host-side statistics --------------------------------------------

    def statistics_per_image(
        self,
        dets: List[np.ndarray],
        batch,
        img_hw: Tuple[int, int],
        stats: List,
        confusion=None,
    ) -> None:
        """Per-image TP accumulation in native coordinates.

        Parity: train_utils.py:333-401 — GT xywh-norm -> pixel xyxy in the
        letterbox frame, predictions de-letterboxed to native space, and the
        TP matrix computed in native space via the same ratio_pad transform.
        """
        targets = batch.targets
        mask = batch.target_mask
        h, w = img_hw
        for si, det in enumerate(dets):
            rows = targets[(targets[:, 0] == si) & mask]
            tcls = rows[:, 1].astype(int).tolist() if len(rows) else []
            shape0, ratio_pad = batch.shapes[si]
            native = shape0 if shape0 != (0, 0) else (h, w)

            if det.shape[0] == 0:
                if len(rows):
                    stats.append(
                        (np.zeros((0, len(IOUV)), bool), np.zeros(0), np.zeros(0), tcls)
                    )
                continue

            if self.single_cls:
                det = det.copy()
                det[:, 5] = 0
            pred_native = det.copy()
            pred_native[:, :4] = scale_coords(
                (h, w), det[:, :4], native, ratio_pad if shape0 != (0, 0) else None
            )

            if len(rows):
                tbox = xywh2xyxy(rows[:, 2:6] * np.array([w, h, w, h], np.float32))
                tbox = scale_coords((h, w), tbox, native, ratio_pad if shape0 != (0, 0) else None)
                labels_native = np.concatenate([rows[:, 1:2], tbox], 1)
                correct = process_batch(pred_native, labels_native)
                if confusion is not None:
                    confusion.process_batch(pred_native, labels_native)
            else:
                correct = np.zeros((det.shape[0], len(IOUV)), bool)
            stats.append((correct, det[:, 4], det[:, 5], tcls))

    # ---- main loop ---------------------------------------------------------

    def validation(self, verbose: Optional[bool] = None) -> Dict[str, Any]:
        """Run the full loop; returns the reference's result dict.

        Keys: mp, mr, map50, map, loss (lbox, lobj, lcls), maps (per-class
        mAP array), t (pre, inference, NMS ms/img), stats tuple.
        """
        verbose = self.verbose if verbose is None else verbose
        stats: List = []
        loss_sum = np.zeros(3, np.float64)
        dt = np.zeros(3, np.float64)
        seen = 0
        n_batches = 0

        loss_fn = None
        if self.compute_loss is not None and not self.tta:
            loss_fn = jax.jit(
                lambda raw, t, m, w: self.compute_loss(
                    [r.astype(jnp.float32) for r in raw], t, m, image_weight=w
                )[1]
            )

        def _barrier(x):
            # true device-completion barrier (see self._tunneled note)
            if self._tunneled:
                jax.device_get(jnp.ravel(x)[0])
            else:
                x.block_until_ready()

        # opt-in device-level trace of the whole val loop (AYOLO_TRACE_DIR);
        # complements the host-side pre/infer/NMS ms/img trio below
        from ayolov2_tpu.utils.profiling import maybe_trace

        with maybe_trace("val"):
            return self._validation_loop(
                verbose, stats, loss_sum, dt, seen, n_batches, loss_fn, _barrier
            )

    def _validation_loop(
        self, verbose, stats, loss_sum, dt, seen, n_batches, loss_fn, _barrier
    ) -> Dict[str, Any]:
        for batch in self.loader:
            bs, h, w = batch.images.shape[0], batch.images.shape[1], batch.images.shape[2]
            t0 = time.perf_counter()
            images = jnp.asarray(batch.images)
            _barrier(images)
            t1 = time.perf_counter()

            if self.detection_fn is not None:
                # exported-engine path: fixed (bs, k, 6) + counts come straight
                # from the artifact (convert_trt_out consumption semantics)
                det, n_valid = self.detection_fn(images)
                det = jnp.asarray(det)
                _barrier(det)
                t2 = t3 = time.perf_counter()
            elif self.use_fused:
                det, n_valid = self._fused_step((h, w))(self.variables, images)
                _barrier(det)
                t2 = t3 = time.perf_counter()
            else:
                pred, raw = self._forward(self.variables, images)
                _barrier(pred)
                t2 = time.perf_counter()

                if loss_fn is not None and raw is not None:
                    # exclude padded final-batch rows from the loss exactly:
                    # mask their target slots and weight their images 0 so
                    # the reported val loss matches the reference's
                    # short-last-batch averaging (ADVICE r2)
                    nr = getattr(batch, "n_real", bs)
                    t_mask = batch.target_mask & (batch.targets[:, 0] < nr)
                    img_w = (np.arange(bs) < nr).astype(np.float32)
                    items = loss_fn(
                        raw,
                        jnp.asarray(batch.targets),
                        jnp.asarray(t_mask),
                        jnp.asarray(img_w),
                    )
                    loss_sum += np.asarray(items)[:3]

                if self.hybrid_label:
                    wh = jnp.asarray([w, h], jnp.float32)
                    pred = self._inject_labels(pred, jnp.asarray(batch.targets), jnp.asarray(batch.target_mask), wh)
                det, n_valid = self._run_nms(pred)
                _barrier(det)
                t3 = time.perf_counter()

            dt += (t1 - t0, t2 - t1, t3 - t2)
            # count and score only the real items of a padded final batch
            # (the reference runs a short last batch; we keep static shapes
            # and slice instead — loader.Batch.n_real)
            n_real = getattr(batch, "n_real", bs)
            seen += n_real
            n_batches += 1

            dets = detections_to_list(np.asarray(det), np.asarray(n_valid))[:n_real]
            self.statistics_per_image(dets, batch, (h, w), stats, confusion=self.confusion)

        return self.compute_statistics(stats, loss_sum, dt, seen, n_batches, verbose)

    def compute_statistics(
        self, stats: List, loss_sum, dt, seen: int, n_batches: int, verbose: bool
    ) -> Dict[str, Any]:
        """ap_per_class rollup + report (train_utils.py:475-571)."""
        maps = np.zeros(self.nc)
        mp = mr = map50 = map5095 = 0.0
        nt = np.zeros(1)
        if stats:
            arrs = [
                np.concatenate(
                    [
                        np.asarray(x[i]).reshape(-1, len(IOUV)) if i == 0 else np.asarray(x[i]).reshape(-1)
                        for x in stats
                    ],
                    0,
                )
                for i in range(3)
            ]
            tcls = np.concatenate([np.asarray(x[3]) for x in stats]) if any(len(x[3]) for x in stats) else np.zeros(0)
            if len(tcls):
                nt = np.bincount(tcls.astype(np.int64), minlength=self.nc)
            if len(arrs[0]):
                p, r, ap, f1, ap_class = ap_per_class(
                    arrs[0].astype(bool), arrs[1], arrs[2], tcls,
                    plot=self.plot_dir is not None, save_dir=self.plot_dir, names=self.names,
                )
                ap50, ap_mean = ap[:, 0], ap.mean(1)
                mp, mr, map50, map5095 = p.mean(), r.mean(), ap50.mean(), ap_mean.mean()
                for i, c in enumerate(ap_class):
                    maps[c] = ap_mean[i]
                if verbose and self.nc > 1:
                    for i, c in enumerate(ap_class):
                        LOGGER.info(
                            "%20s %11d %11d %11.3g %11.3g %11.3g %11.3g",
                            self.names[c], seen, int(nt[c]), p[i], r[i], ap50[i], ap_mean[i],
                        )

        if self.confusion is not None and self.plot_dir:
            from pathlib import Path

            from ayolov2_tpu.utils.plots import plot_confusion_matrix

            Path(self.plot_dir).mkdir(parents=True, exist_ok=True)
            plot_confusion_matrix(
                self.confusion.matrix, Path(self.plot_dir) / "confusion_matrix.png", self.names
            )
        t = tuple(x / max(seen, 1) * 1e3 for x in dt)  # ms per image
        LOGGER.info(
            "%20s %11s %11s %11s %11s %11s %11s", "Class", "Images", "Labels", "P", "R", "mAP@.5", "mAP@.5:.95"
        )
        LOGGER.info(
            "%20s %11d %11d %11.3g %11.3g %11.3g %11.3g",
            "all", seen, int(nt.sum()), mp, mr, map50, map5095,
        )
        LOGGER.info(
            "Speed: %.1f/%.1f/%.1f ms per image (pre/inference/NMS)", t[0], t[1], t[2]
        )
        return {
            "mp": float(mp),
            "mr": float(mr),
            "map50": float(map50),
            "map50_95": float(map5095),
            "loss": (loss_sum / max(n_batches, 1)).tolist(),
            "maps": maps,
            "t": t,
            "seen": seen,
        }
