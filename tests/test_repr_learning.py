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


def _image_major(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """[i0v0, i0v1, i1v0, ...] — the reference collate layout."""
    return np.stack([v1, v2], axis=1).reshape(-1, v1.shape[-1])


def test_infonce_prefers_aligned_views():
    rng = np.random.default_rng(0)
    bs, d = 8, 32
    base = rng.standard_normal((bs, d)).astype(np.float32)
    aligned = _image_major(base, base + 0.01 * rng.standard_normal((bs, d)).astype(np.float32))
    random = _image_major(base, rng.standard_normal((bs, d)).astype(np.float32))
    loss_fn = InfoNCELoss(batch_size=bs, n_trans=2)
    _, la = loss_fn(jnp.asarray(aligned))
    _, lr = loss_fn(jnp.asarray(random))
    assert float(la[0]) < float(lr[0])
    assert float(la[0]) < 0.5  # near-identical views: easy discrimination


def test_infonce_matches_reference_torch():
    """Numerical parity vs the reference InfoNCELoss (losses_repr.py:49-136)
    on image-major batches, including n_trans > 2."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from scripts.loss.losses_repr import InfoNCELoss as RefInfoNCE
        from scripts.loss.losses_repr import RLLoss as RefRLLoss
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.default_rng(3)
    for n_trans in (2, 3):
        bs, d = 6, 16
        feats = rng.standard_normal((bs * n_trans, d)).astype(np.float32)
        ref = RefInfoNCE(torch.device("cpu"), batch_size=bs, n_trans=n_trans)
        ref_total, ref_items, _ = ref(torch.from_numpy(feats))
        ours = InfoNCELoss(batch_size=bs, n_trans=n_trans)
        total, items = ours(jnp.asarray(feats))
        np.testing.assert_allclose(float(items[0]), float(ref_items[0]), rtol=1e-5)
        np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)

    # RLLoss parity on the same image-major layout
    feats = rng.standard_normal((12, 16)).astype(np.float32)
    ref_total, ref_items, _ = RefRLLoss()(torch.from_numpy(feats))
    total, items = RLLoss()(jnp.asarray(feats))
    np.testing.assert_allclose(float(items[0]), float(ref_items[0]), rtol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


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
    assert batch.shape[0] == 8  # bs * n_trans, image-major interleave
    assert len(paths) == 4
    # rows 2i and 2i+1 are views of the SAME image: same letterboxed base,
    # so they agree far more than views of different images do.
    same = np.abs(batch[0].astype(np.int32) - batch[1].astype(np.int32)).mean()
    other = np.abs(batch[0].astype(np.int32) - batch[2].astype(np.int32)).mean()
    assert same < other


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
def test_repr_trainer_rl_base_one_epoch(tmp_path):
    """ADVICE r1: exercise rl_type='base' end-to-end so the RLLoss pairing
    matches the loader layout (views of the SAME image are paired)."""
    from ayolov2_tpu.train.repr_trainer import RepresentationLearningTrainer
    from ayolov2_tpu.utils.config import load_yaml

    cfg = load_yaml("res/configs/cfg/train_config_repr.yaml")
    cfg["train"].update(epochs=1, batch_size=4, image_size=64, n_skip=8, rl_type="base")

    model = build_model("res/configs/model/simclr.yaml", dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ds = RLImageDataset(VOC_TRAIN, img_size=64, batch_size=4, n_skip=8, n_trans=2)
    loader = RLDataLoader(ds, batch_size=4, shuffle=True)
    trainer = RepresentationLearningTrainer(
        model, variables, cfg, loader, val_loader=RLDataLoader(ds, batch_size=4),
        rl_type="base", log_dir=str(tmp_path),
    )
    trainer.train()
    assert np.isfinite(trainer.last_items).all()
    assert (tmp_path / "weights" / "last.ckpt").exists()


@needs_fixtures
def test_crop_bboxes(tmp_path):
    n = crop_and_save_bboxes(VOC_TRAIN, str(tmp_path / "crops"))
    assert n > 0
    assert len(list((tmp_path / "crops").glob("*.jpg"))) == n
