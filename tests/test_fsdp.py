"""ZeRO-style sharded train state (``train.fsdp``) on the 8-device CPU mesh.

Beyond-reference scaling feature: the reference replicates model + optimizer
state per GPU (plain DDP, scripts/train/train_model_builder.py:93-114);
``parallel.zero_sharding`` instead shards every large param/opt/EMA leaf over
the data axis and lets XLA's SPMD partitioner insert the all-gathers /
sharded updates (the ZeRO-3 recipe as layout annotations). These tests pin:

  - the sharding-spec rule (large divisible leaves sharded on their largest
    dim, biases/BN vectors/scalars replicated),
  - numeric parity of the fsdp-sharded train step vs the replicated step,
  - the actual per-device footprint (a sharded leaf lives in n_dev pieces),
  - the trainer wiring (``train.fsdp: true`` -> sharded state, checkpoint
    gathered back to a layout-independent file).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ayolov2_tpu.loss import ComputeLoss
from ayolov2_tpu.models import build_model
from ayolov2_tpu.parallel import batch_sharding, get_mesh, replicate, zero_sharding
from ayolov2_tpu.train.optimizer import build_optimizer
from ayolov2_tpu.train.train_state import create_train_state, make_train_step
from tests.test_loss import HYP
from tests.test_train_step import TINY_CFG, _batch

MIN_ELEMS = 2048  # tiny model: shard anything above a couple KB


def _setup():
    model = build_model(TINY_CFG, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True
    )
    loss_fn = ComputeLoss.from_hyp(np.asarray(model.head.stride_anchors()), 6, HYP)
    tx = build_optimizer(
        variables["params"],
        {"optimizer_params": {"lr": 0.01}, **HYP, "weight_decay": 5e-4},
        epochs=3, steps_per_epoch=10, batch_size=8,
    )
    return model, variables, loss_fn, tx


def _is_sharding(x):
    return isinstance(x, NamedSharding)


def test_zero_sharding_spec_rule():
    mesh = get_mesh()
    n = int(mesh.shape["data"])
    assert n == 8, "conftest must force 8 virtual devices"
    model, variables, loss_fn, tx = _setup()
    state = create_train_state(variables, tx)
    specs = zero_sharding(mesh, state, min_elems=MIN_ELEMS)

    flat_state = jax.tree_util.tree_leaves(state)
    flat_spec = jax.tree_util.tree_leaves(specs, is_leaf=_is_sharding)
    assert len(flat_state) == len(flat_spec)

    n_sharded = 0
    for arr, sh in zip(flat_state, flat_spec):
        shape = np.shape(arr)
        divisible = [d for d, s in enumerate(shape) if s % n == 0 and s >= n]
        if np.size(arr) < MIN_ELEMS or not divisible:
            assert sh.spec == P(), (shape, sh.spec)
            continue
        d = max(divisible, key=lambda i: shape[i])
        want = [None] * len(shape)
        want[d] = "data"
        assert sh.spec == P(*want), (shape, sh.spec)
        n_sharded += 1
    # the tiny model still has real conv kernels (and their momentum/EMA
    # copies) big enough to shard
    assert n_sharded >= 6


def test_fsdp_step_parity_vs_replicated():
    """3 fsdp-sharded steps == 3 replicated steps, and the sharded state
    actually lives in n_dev pieces per large leaf."""
    mesh = get_mesh()
    model, variables, loss_fn, tx = _setup()
    step_fn = make_train_step(model, loss_fn, tx, image_dtype=jnp.float32)
    state = create_train_state(variables, tx)
    images, targets, mask = _batch(bs=8)

    rep = replicate(mesh)
    zs = zero_sharding(mesh, state, min_elems=MIN_ELEMS)
    step_r = jax.jit(
        step_fn,
        in_shardings=(rep, batch_sharding(mesh, 4), rep, rep),
        out_shardings=(rep, rep),
    )
    step_z = jax.jit(
        step_fn,
        in_shardings=(zs, batch_sharding(mesh, 4), rep, rep),
        out_shardings=(zs, rep),
    )
    sr = jax.device_put(state, rep)
    sz = jax.device_put(state, zs)
    imgs = jax.device_put(images, batch_sharding(mesh, 4))
    for _ in range(3):
        sr, items_r = step_r(sr, imgs, targets, mask)
        sz, items_z = step_z(sz, imgs, targets, mask)

    np.testing.assert_allclose(np.asarray(items_r), np.asarray(items_z),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sr.params),
                    jax.tree_util.tree_leaves(sz.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sr.ema_params),
                    jax.tree_util.tree_leaves(sz.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # footprint: the largest param leaf is split 8 ways on device
    big = max(jax.tree_util.tree_leaves(sz.params), key=np.size)
    assert not big.sharding.is_fully_replicated
    shard = big.addressable_shards[0].data
    assert shard.size == big.size // 8


def test_fsdp_two_process_cluster_matches_replicated():
    """zero_sharding under REAL jax.distributed: a 2-process CPU cluster
    (8 devices total) runs the fsdp-sharded step — each process holds only
    its addressable shards of every large leaf — and the replicated loss it
    prints must match the plain replicated-state cluster bit-for-bit on the
    same global batch."""
    from tests.test_multihost import _run_cluster

    rep, _ = _run_cluster(2)
    fsdp, _ = _run_cluster(2, env={"AYOLO_MH_FSDP": "1"})
    # identical across the two processes of the fsdp cluster
    np.testing.assert_allclose(fsdp[0][0], fsdp[1][0], rtol=0, atol=0)
    # and numerically matches the replicated-state cluster (fp tolerance:
    # the sharded optimizer update changes reduction layouts)
    np.testing.assert_allclose(fsdp[0][0], rep[0][0], rtol=1e-4, atol=1e-6)
    assert all(np.isfinite(b).all() for b in fsdp[0])


VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"


@pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable")
def test_trainer_fsdp_smoke(tmp_path):
    """train.fsdp wiring: sharded trainer state, one epoch, checkpoint is
    gathered to a layout-independent file that a replicated trainer resumes."""
    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.models import init_model
    from ayolov2_tpu.train.trainer import YoloTrainer
    from ayolov2_tpu.utils.config import load_yaml

    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=1, batch_size=8, image_size=64, workers=2, patience=5,
        auto_anchor=False, label_type="labels", half=False, fsdp=True,
    )
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ds = DetectionDataset(VOC_TRAIN, img_size=64, batch_size=8, rect=False,
                          stride=32, n_skip=8)
    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True)
    trainer = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=None, log_dir=str(tmp_path), model_cfg_dict={"n_classes": 20},
    )
    # the live state is actually sharded
    big = max(jax.tree_util.tree_leaves(trainer.state.params), key=np.size)
    assert not big.sharding.is_fully_replicated
    trainer.train()
    assert (tmp_path / "weights" / "last.ckpt").exists()

    # a replicated (fsdp off) trainer resumes the gathered checkpoint
    cfg["train"]["fsdp"] = False
    trainer2 = YoloTrainer(
        model, variables, cfg, loader,
        val_loader=None, log_dir=str(tmp_path / "resume"),
    )
    trainer2.resume(str(tmp_path / "weights" / "last.ckpt"))
    assert int(trainer2.state.step) == int(trainer.state.step)


@pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable")
def test_kd_trainer_fsdp_smoke(tmp_path):
    """train.fsdp in the soft-teacher trainer: the STUDENT state is
    ZeRO-sharded (the frozen teacher stays replicated), one epoch runs, and
    the saved checkpoint is gathered/layout-independent."""
    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.models import fuse_params, init_model
    from ayolov2_tpu.train.kd_trainer import SoftTeacherTrainer
    from ayolov2_tpu.utils.config import load_yaml

    cfg = load_yaml("res/configs/cfg/distillation.yaml")
    cfg["train"].update(epochs=1, batch_size=4, image_size=64, n_skip=12, fsdp=True)

    # wide enough that the largest conv kernel (3*3*64*128 = 73,728 elems)
    # crosses zero_sharding's default 65,536-element threshold
    kd_cfg = {**TINY_CFG, "width_multiple": 0.25}
    teacher = build_model(kd_cfg, dtype=jnp.float32, fused=True, nc=20)
    t_unfused = build_model(kd_cfg, dtype=jnp.float32, nc=20)
    t_vars = fuse_params(init_model(t_unfused, jax.random.PRNGKey(1), img_size=64))
    student = build_model(kd_cfg, dtype=jnp.float32, nc=20)
    s_vars = init_model(student, jax.random.PRNGKey(0), img_size=64)

    common = dict(img_size=64, batch_size=4, stride=32, n_skip=12, label_type="labels")
    labeled = DataLoader(DetectionDataset(VOC_TRAIN, **common), batch_size=4,
                         shuffle=True, drop_last=True)
    unlabeled = DataLoader(DetectionDataset(VOC_TRAIN, **common), batch_size=4,
                           shuffle=True, drop_last=True)
    trainer = SoftTeacherTrainer(
        student, {"params": s_vars["params"], "batch_stats": s_vars.get("batch_stats", {})},
        teacher, t_vars, cfg, labeled, unlabeled, val_loader=None,
        log_dir=str(tmp_path), n_devices=4,
    )
    big = max(jax.tree_util.tree_leaves(trainer.state.params), key=np.size)
    assert not big.sharding.is_fully_replicated
    trainer.train()
    assert np.isfinite(trainer.last_items).all()
    ckpt = tmp_path / "weights" / "last.ckpt"
    assert ckpt.exists()
    from ayolov2_tpu.utils.checkpoint import load_variables

    variables, _ = load_variables(ckpt)
    n_ckpt = sum(np.size(x) for x in jax.tree_util.tree_leaves(variables["params"]))
    n_live = sum(np.size(x) for x in jax.tree_util.tree_leaves(trainer.state.params))
    assert n_ckpt == n_live
