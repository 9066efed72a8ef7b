"""Atomic + async checkpointing (utils/checkpoint).

The reference's torch.save blocks the train loop and a crash mid-write
corrupts last.ckpt (scripts/train/yolo_trainer.py:374-390). Here the write
is atomic (tmp + os.replace) and optionally off-thread
(AsyncCheckpointWriter, opt-in via train.async_ckpt) — jax arrays are
immutable, so the live state pytree is a consistent snapshot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.train.train_state import create_train_state
from ayolov2_tpu.train.trainer import YoloTrainer
from ayolov2_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    load_checkpoint,
    load_variables,
    save_checkpoint,
)
from ayolov2_tpu.utils.config import load_yaml

MODEL_CFG = "res/configs/model/yolov5s.yaml"
VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"


def _tiny_state(seed=0):
    model = build_model(MODEL_CFG, dtype=jnp.float32, nc=20)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)), training=False)
    return create_train_state(variables, optax.sgd(0.01))


def test_save_is_atomic_no_tmp_left(tmp_path):
    state = _tiny_state()
    p = tmp_path / "last.ckpt"
    save_checkpoint(p, state, epoch=1)
    assert p.exists()
    assert not list(tmp_path.glob("*.tmp")), "tmp file must be renamed away"
    # overwrite re-publishes atomically
    save_checkpoint(p, state, epoch=2)
    assert load_checkpoint(p)["meta"]["epoch"] == 2
    assert not list(tmp_path.glob("*.tmp"))


def test_async_writer_matches_sync_bytes(tmp_path):
    state = _tiny_state()
    sync_p, async_p = tmp_path / "sync.ckpt", tmp_path / "async.ckpt"
    save_checkpoint(sync_p, state, epoch=5, best_score=0.3, map50=0.2)
    w = AsyncCheckpointWriter()
    w.submit(lambda: save_checkpoint(async_p, state, epoch=5, best_score=0.3, map50=0.2))
    w.wait()
    assert async_p.read_bytes() == sync_p.read_bytes()
    w.close()


def test_async_writer_orders_same_file(tmp_path):
    # last.ckpt is saved every validation — later submits must win
    state = _tiny_state()
    p = tmp_path / "last.ckpt"
    w = AsyncCheckpointWriter()
    for e in range(6):
        w.submit(lambda e=e: save_checkpoint(p, state, epoch=e))
    w.wait()
    assert load_checkpoint(p)["meta"]["epoch"] == 5
    w.close()


def test_async_writer_surfaces_errors():
    w = AsyncCheckpointWriter()

    def boom():
        raise OSError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # the writer recovers: a later save still lands
    w.submit(lambda: None)
    w.close()


def test_trainer_async_ckpt_end_to_end(tmp_path):
    """train.async_ckpt: true — files on disk and loadable when train() returns."""
    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=1, batch_size=8, image_size=64, workers=1, patience=5,
        auto_anchor=False, label_type="labels", half=False, async_ckpt=True,
    )
    cfg["yolo_augmentation"]["mosaic"] = 0.0
    model = build_model(MODEL_CFG, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ds = DetectionDataset(
        VOC_TRAIN, img_size=64, batch_size=8, rect=False, stride=32, n_skip=8,
        yolo_augmentation=cfg["yolo_augmentation"],
    )
    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=True)
    trainer = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=None, log_dir=str(tmp_path), use_swa=False, n_devices=None,
        model_cfg_dict={"n_classes": 20},
    )
    assert trainer._ckpt_writer is not None
    trainer.train()
    p = tmp_path / "weights" / "last.ckpt"
    assert p.exists() and not list(p.parent.glob("*.tmp"))
    vs, meta = load_variables(p)
    assert meta["epoch"] == 0
    chex_leaves = jax.tree_util.tree_leaves(vs["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in chex_leaves)
