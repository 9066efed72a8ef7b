"""Representation-learning trainer (SimpleRL L1 / SimCLR InfoNCE).

Parity target: /root/reference/scripts/train/yolo_repr_trainer.py:30-470 —
n-view batches through a headless backbone+projection graph, RL L1 or
InfoNCE loss, SGD (RL) or Adam+cosine (SimCLR), best checkpoint by val
loss (saved as best_eNNN semantics).

TPU-first: one jitted train step sharded over the data mesh (the
reference's DataParallel path, train_repr.py:118-119): the view batch is
split across chips, state replicated; XLA inserts the feature all-gather
the InfoNCE similarity matrix needs and the gradient all-reduce.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ayolov2_tpu.loss.losses_repr import InfoNCELoss, RLLoss
from ayolov2_tpu.parallel import batch_sharding, get_mesh, replicate
from ayolov2_tpu.train.trainer import AbstractTrainer
from ayolov2_tpu.utils.checkpoint import save_checkpoint
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


class _ReprState:
    """Minimal state shim compatible with save_checkpoint."""

    def __init__(self, params, batch_stats, opt_state):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.ema_params = params
        self.ema_batch_stats = batch_stats
        self.ema_updates = jnp.zeros((), jnp.int32)
        self.step = jnp.zeros((), jnp.int32)

    def replace(self, **kw):
        out = _ReprState(self.params, self.batch_stats, self.opt_state)
        out.__dict__.update(self.__dict__)
        out.__dict__.update(kw)
        return out


class RepresentationLearningTrainer(AbstractTrainer):
    """Train a headless graph with an RL loss (yolo_repr_trainer parity)."""

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        cfg: Dict[str, Any],
        train_loader,
        val_loader=None,
        rl_type: str = "base",  # "base" (SimpleRL) | "simclr"
        log_dir: str = "runs/repr/exp",
        model_cfg_dict: Optional[Dict[str, Any]] = None,
        n_devices: Optional[int] = None,
    ) -> None:
        tcfg = cfg["train"]
        super().__init__(epochs=int(tcfg["epochs"]))
        self.model = model
        self.cfg = cfg
        self.tcfg = tcfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.rl_type = rl_type
        self.log_dir = Path(log_dir)
        self.wdir = self.log_dir / "weights"
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.model_cfg_dict = model_cfg_dict
        self.best_loss = float("inf")

        n_trans = int(tcfg.get("n_trans", 2))
        bs = int(tcfg["batch_size"])
        if rl_type == "simclr":
            self.loss_fn = InfoNCELoss(
                batch_size=bs, n_trans=n_trans,
                temperature=float(tcfg.get("temperature", 0.07)),
            )
            lr = float(cfg["hyper_params"].get("optimizer_params", {}).get("lr", 3e-4))
            steps = max(len(train_loader), 1) * self.epochs
            sched = optax.cosine_decay_schedule(lr, decay_steps=steps)
            self.tx = optax.adamw(sched, weight_decay=1e-4)
        else:
            self.loss_fn = RLLoss()
            opt = cfg["hyper_params"].get("optimizer_params", {})
            self.tx = optax.sgd(
                float(opt.get("lr", 0.01)),
                momentum=float(opt.get("momentum", 0.937)),
                nesterov=bool(opt.get("nesterov", True)),
            )

        # mesh-sharded step (DP parity, train_repr.py:118-119): view batch
        # split over 'data', state replicated
        devices = jax.devices()[: n_devices or len(jax.devices())]
        self.mesh = get_mesh(devices)
        rep = replicate(self.mesh)
        self.state = _ReprState(
            jax.device_put(variables["params"], rep),
            jax.device_put(variables.get("batch_stats", {}), rep),
            jax.device_put(self.tx.init(variables["params"]), rep),
        )
        self._train_step = jax.jit(
            self._make_step(),
            in_shardings=(rep, rep, rep, batch_sharding(self.mesh, 4)),
            out_shardings=(rep, rep, rep, rep),
        )
        self._eval_step = jax.jit(
            self._make_eval(),
            in_shardings=(rep, rep, batch_sharding(self.mesh, 4)),
            out_shardings=rep,
        )
        self.last_items = np.zeros(1)

    def _make_step(self):
        model, loss_fn, tx = self.model, self.loss_fn, self.tx

        def step(params, batch_stats, opt_state, images):
            imgs = images.astype(jnp.float32) / 255.0

            def compute(p):
                feats, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs, training=True, mutable=["batch_stats"],
                )
                total, items = loss_fn(feats)
                return total, (mutated["batch_stats"], items)

            (_, (new_stats, items)), grads = jax.value_and_grad(compute, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, items

        return step

    def _make_eval(self):
        model, loss_fn = self.model, self.loss_fn

        def ev(params, batch_stats, images):
            imgs = images.astype(jnp.float32) / 255.0
            feats = model.apply({"params": params, "batch_stats": batch_stats}, imgs, training=False)
            _, items = loss_fn(feats)
            return items

        return ev

    def epoch_iterator(self):
        return self.train_loader

    def training_step(self, batch, batch_idx: int) -> Dict[str, float]:
        images, _ = batch
        params, stats, opt, items = self._train_step(
            self.state.params, self.state.batch_stats, self.state.opt_state, jnp.asarray(images)
        )
        self.state = self.state.replace(params=params, batch_stats=stats, opt_state=opt)
        if batch_idx % 20 == 0:
            self.last_items = np.asarray(items)
            LOGGER.info("epoch %3d step %4d  %s loss %.5f",
                        self.current_epoch, batch_idx, self.rl_type, float(self.last_items[0]))
        return {}

    def on_preempt(self) -> None:
        # mid-epoch SIGTERM: persist the encoder state before exiting
        self._save("last.ckpt")

    def validation(self) -> None:
        if self.val_loader is None:
            self._save("last.ckpt")
            return
        losses = []
        for images, _ in self.val_loader:
            items = self._eval_step(self.state.params, self.state.batch_stats, jnp.asarray(images))
            losses.append(float(np.asarray(items)[0]))
        val_loss = float(np.mean(losses)) if losses else math.inf
        self.log_dict({"val_loss": val_loss})
        LOGGER.info("epoch %3d val %s loss %.5f", self.current_epoch, self.rl_type, val_loss)
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self._save(f"best_e{self.current_epoch:03d}.ckpt")
        self._save("last.ckpt")

    def _save(self, name: str) -> None:
        save_checkpoint(
            self.wdir / name, self.state, epoch=self.current_epoch,
            best_score=-self.best_loss, model_cfg=self.model_cfg_dict,
        )
