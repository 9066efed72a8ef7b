"""Representation-learning tests (test_representation_learning analogue)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.data.datasets_repr import (
    RLDataLoader,
    RLImageDataset,
    SimCLRDataset,
    crop_and_save_bboxes,
)
from ayolov2_tpu.loss.losses_repr import InfoNCELoss, RLLoss
from ayolov2_tpu.models import build_model, init_model

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
needs_fixtures = pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixtures unavailable")


def test_rl_loss_identical_views_zero():
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32))
    doubled = jnp.repeat(feats, 2, axis=0)  # even/odd pairs identical
    total, items = RLLoss()(doubled)
    assert float(items[0]) < 1e-7
    total2, items2 = RLLoss()(jnp.asarray(np.random.default_rng(1).standard_normal((16, 16)), jnp.float32))
    assert float(items2[0]) > 0.1


def test_infonce_prefers_aligned_views():
    rng = np.random.default_rng(0)
    bs, d = 8, 32
    base = rng.standard_normal((bs, d)).astype(np.float32)
    # aligned: view2 = view1 + tiny noise, layout tile(arange(bs)) view-major
    aligned = np.concatenate([base, base + 0.01 * rng.standard_normal((bs, d)).astype(np.float32)])
    random = np.concatenate([base, rng.standard_normal((bs, d)).astype(np.float32)])
    loss_fn = InfoNCELoss(batch_size=bs, n_trans=2)
    _, la = loss_fn(jnp.asarray(aligned))
    _, lr = loss_fn(jnp.asarray(random))
    assert float(la[0]) < float(lr[0])
    assert float(la[0]) < 0.5  # near-identical views: easy discrimination


def test_simclr_model_graph_outputs_features():
    model = build_model("res/configs/model/simclr.yaml", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    out = model.apply(variables, jnp.zeros((4, 64, 64, 3)), training=False)
    assert out.shape == (4, 128)  # projection head dim


@needs_fixtures
def test_rl_dataset_and_loader_layout():
    ds = RLImageDataset(VOC_TRAIN, img_size=64, batch_size=4, n_skip=6, n_trans=2)
    views, path, shapes = ds[0]
    assert views.shape[0] == 2 and views.shape[3] == 3
    loader = RLDataLoader(ds, batch_size=4)
    batch, paths = next(iter(loader))
    assert batch.shape[0] == 8  # n_trans * bs, view-major
    assert len(paths) == 4


@needs_fixtures
def test_simclr_dataset_views_differ():
    ds = SimCLRDataset(VOC_TRAIN, img_size=64, batch_size=4, n_skip=6, n_trans=2)
    views, _, _ = ds[0]
    assert not np.array_equal(views[0], views[1])


@needs_fixtures
def test_repr_trainer_one_epoch(tmp_path):
    from ayolov2_tpu.train.repr_trainer import RepresentationLearningTrainer
    from ayolov2_tpu.utils.config import load_yaml

    cfg = load_yaml("res/configs/cfg/train_config_repr.yaml")
    cfg["train"].update(epochs=1, batch_size=4, image_size=64, n_skip=8, rl_type="simclr")

    model = build_model("res/configs/model/simclr.yaml", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ds = SimCLRDataset(VOC_TRAIN, img_size=64, batch_size=4, n_skip=8, n_trans=2)
    loader = RLDataLoader(ds, batch_size=4, shuffle=True)
    trainer = RepresentationLearningTrainer(
        model, variables, cfg, loader, val_loader=RLDataLoader(ds, batch_size=4),
        rl_type="simclr", log_dir=str(tmp_path),
    )
    trainer.train()
    assert np.isfinite(trainer.last_items).all()
    assert (tmp_path / "weights" / "last.ckpt").exists()
    assert any(tmp_path.glob("weights/best_e*.ckpt"))


@needs_fixtures
def test_crop_bboxes(tmp_path):
    n = crop_and_save_bboxes(VOC_TRAIN, str(tmp_path / "crops"))
    assert n > 0
    assert len(list((tmp_path / "crops").glob("*.jpg"))) == n
