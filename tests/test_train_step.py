"""Train-step tests: optimizer groups/schedules, EMA, pjit over the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.loss import ComputeLoss
from ayolov2_tpu.models import build_model
from ayolov2_tpu.parallel import batch_sharding, get_mesh, replicate, shard_batch
from ayolov2_tpu.train.optimizer import build_optimizer, make_group_schedules
from ayolov2_tpu.train.train_state import EMA, create_train_state, make_eval_step, make_train_step
from tests.test_loss import ANCHORS, HYP, _fake_batch

TINY_CFG = {
    "input_channel": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "n_classes": 6,
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2], {"activation": "SiLU"}],
        [-1, 1, "Conv", [128, 3, 2], {"activation": "SiLU"}],
        [-1, 1, "C3", [128], {"activation": "SiLU"}],
        [-1, 1, "Conv", [256, 3, 2], {"activation": "SiLU"}],
        [-1, 1, "Conv", [512, 3, 2], {"activation": "SiLU"}],
        [-1, 1, "SPPF", [512, 5], {"activation": "SiLU"}],
    ],
    "head": [[[3, 4, 5], 1, "YOLOHead", [6, None]]],
}
TINY_CFG["head"][0][3][1] = TINY_CFG["anchors"]


def test_group_schedules_warmup():
    lr_fn, mom_fn = make_group_schedules(
        lr0=0.01, lrf=0.1, epochs=10, steps_per_epoch=500,
        warmup_epochs=3.0, warmup_bias_lr=0.1, warmup_momentum=0.8, momentum=0.937,
    )
    # warmup start: weight lr 0, bias lr 0.1, momentum 0.8
    assert float(lr_fn(jnp.asarray(0.0), "weight")) == pytest.approx(0.0)
    assert float(lr_fn(jnp.asarray(0.0), "bias")) == pytest.approx(0.1)
    assert float(mom_fn(jnp.asarray(0.0))) == pytest.approx(0.8)
    # after warmup (nw=1500): all groups at lr0 * lf(epoch); momentum final
    nw = 1500
    lw = float(lr_fn(jnp.asarray(float(nw + 1)), "weight"))
    lb = float(lr_fn(jnp.asarray(float(nw + 1)), "bias"))
    assert lw == pytest.approx(lb, rel=1e-5)
    assert float(mom_fn(jnp.asarray(float(nw + 1)))) == pytest.approx(0.937)
    # cosine decays to lr0 * lrf at epoch == epochs
    last = float(lr_fn(jnp.asarray(10.0 * 500), "weight"))
    assert last == pytest.approx(0.01 * 0.1, rel=1e-6)


def test_warmup_ramp_matches_reference_interp():
    """Numeric parity of the lr/momentum warmup vs the reference's np.interp
    ramp (yolo_trainer.py:194-221 == kd_trainer.py:548-576): bias lr falls
    from warmup_bias_lr, others rise from 0, momentum rises from
    warmup_momentum; all reach lr0*lf(epoch) / momentum at ni == nw."""
    import math

    lr0, lrf, epochs, spe = 0.01, 0.1, 20, 400
    wu_e, wu_bias, wu_mom, mom = 3.0, 0.1, 0.8, 0.937
    lr_fn, mom_fn = make_group_schedules(
        lr0=lr0, lrf=lrf, epochs=epochs, steps_per_epoch=spe,
        warmup_epochs=wu_e, warmup_bias_lr=wu_bias, warmup_momentum=wu_mom, momentum=mom,
    )
    nw = max(round(wu_e * spe), 1000)

    def lf(e):
        return ((1 + math.cos(e * math.pi / epochs)) / 2) * (1 - lrf) + lrf

    for ni in (0, 17, nw // 2, nw - 1, nw, nw + 100):
        epoch = ni // spe
        for group, start in (("weight", 0.0), ("bn_scale", 0.0), ("bias", wu_bias)):
            want = float(np.interp(ni, [0, nw], [start, lr0 * lf(epoch)])) if ni < nw else lr0 * lf(epoch)
            got = float(lr_fn(jnp.asarray(float(ni)), group))
            assert got == pytest.approx(want, rel=1e-5, abs=1e-9), (ni, group, got, want)
        want_m = float(np.interp(ni, [0, nw], [wu_mom, mom])) if ni < nw else mom
        assert float(mom_fn(jnp.asarray(float(ni)))) == pytest.approx(want_m, rel=1e-6)


def test_accumulate_schedule_units():
    """ADVICE r1: with MultiSteps(every_k=accumulate) the schedule counter
    ticks once per `accumulate` micro-batches; build_optimizer must convert
    steps_per_epoch (micro-batch units) to update units, or cosine decay
    runs ~accumulate^2 too slow (reference ramp: yolo_trainer.py:124-137)."""
    import math

    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))}}
    hyp = {
        "optimizer_params": {"lr": 0.01, "momentum": 0.0, "nesterov": False},
        "lrf": 0.1, "weight_decay": 0.0, "warmup_epochs": 0.0,
        "warmup_min_iters": 1,
    }
    epochs, spe, accumulate = 4, 8, 4  # 8 micro-batches/epoch -> 2 updates/epoch
    tx = build_optimizer(params, hyp, epochs=epochs, steps_per_epoch=spe,
                         batch_size=16, accumulate=accumulate)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    lrs = []  # observed |update| on kernel at each emitted optimizer update
    for m in range(epochs * spe):
        upd, state = tx.update(grads, state, params)
        mag = float(jnp.abs(upd["dense"]["kernel"]).max())
        if (m + 1) % accumulate == 0:
            lrs.append(mag)
        else:
            assert mag == 0.0  # MultiSteps accumulates, no update mid-window
    assert len(lrs) == epochs * spe // accumulate

    upd_per_epoch = spe // accumulate
    for s, lr in enumerate(lrs):
        if s == 0:
            continue  # inside the 1-step warmup ramp
        e = s // upd_per_epoch
        lf = ((1.0 + math.cos(e * math.pi / epochs)) / 2.0) * (1.0 - 0.1) + 0.1
        assert lr == pytest.approx(0.01 * lf, rel=1e-4), (s, e, lr)


def test_ema_rate_ramps():
    ema = EMA(decay=0.9999, tau=2000.0)
    assert float(ema.rate(jnp.asarray(1))) < 0.001
    assert float(ema.rate(jnp.asarray(20000))) == pytest.approx(0.9999, rel=1e-3)


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model(TINY_CFG, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    loss_fn = ComputeLoss.from_hyp(
        np.asarray(model.head.stride_anchors() if model.head else ANCHORS), 6, HYP
    )
    tx = build_optimizer(
        variables["params"], {"optimizer_params": {"lr": 0.01}, **HYP, "weight_decay": 5e-4},
        epochs=3, steps_per_epoch=10, batch_size=8,
    )
    return model, variables, loss_fn, tx


def _batch(bs=8, img=64, m=64):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (bs, img, img, 3), dtype=np.uint8)
    targets = np.zeros((m, 6), np.float32)
    mask = np.zeros((m,), bool)
    for i in range(bs):
        targets[i] = [i, i % 6, 0.5, 0.5, 0.25, 0.25]
        mask[i] = True
    return images, targets, mask


def test_single_device_train_step(tiny_setup):
    model, variables, loss_fn, tx = tiny_setup
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.float32))
    images, targets, mask = _batch()
    s1, items1 = step(state, images, targets, mask)
    s2, items2 = step(s1, images, targets, mask)
    assert int(s2.step) == 2
    assert np.isfinite(np.asarray(items1)).all()
    # params actually moved
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # EMA trails params
    de = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), s2.ema_params, s2.params)
    assert max(jax.tree_util.tree_leaves(de)) > 0


def test_multichip_pjit_train_step(tiny_setup):
    """The dryrun_multichip path: 8-way data-parallel train step on CPU mesh."""
    model, variables, loss_fn, tx = tiny_setup
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = get_mesh()
    state = create_train_state(variables, tx)
    state = jax.device_put(state, replicate(mesh))

    step = jax.jit(
        make_train_step(model, loss_fn, tx, image_dtype=jnp.float32),
        in_shardings=(
            replicate(mesh),
            batch_sharding(mesh, 4),
            replicate(mesh),  # targets carry cross-image rows; replicate
            replicate(mesh),
        ),
        out_shardings=(replicate(mesh), replicate(mesh)),
    )
    images, targets, mask = _batch(bs=8)
    images = jax.device_put(images, batch_sharding(mesh, 4))
    new_state, items = step(state, images, targets, mask)
    assert np.isfinite(np.asarray(items)).all()
    assert int(new_state.step) == 1


def test_eval_step_shapes(tiny_setup):
    model, variables, loss_fn, tx = tiny_setup
    state = create_train_state(variables, tx)
    ev = jax.jit(make_eval_step(model, image_dtype=jnp.float32))
    images, _, _ = _batch(bs=2)
    out = ev(state, images)
    assert out.shape[0] == 2 and out.shape[2] == 11  # 5 + nc
    assert bool(jnp.isfinite(out).all())


def test_optimizer_group_labels(tiny_setup):
    from ayolov2_tpu.train.optimizer import _param_labels

    model, variables, loss_fn, tx = tiny_setup
    labels = _param_labels(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(labels)
    kinds = {}
    for path, lab in flat:
        kinds.setdefault(lab, 0)
        kinds[lab] += 1
    assert set(kinds) == {"bn_scale", "weight", "bias"}
    # every bn leaf is in the no-decay group
    for path, lab in flat:
        names = [getattr(p, "key", "") for p in path]
        if "bn" in names:
            assert lab == "bn_scale"


def test_ema_decay_curve():
    """EMA rate d(x) = decay * (1 - e^{-x/2000}) (torch_utils.py:377-426)."""
    from ayolov2_tpu.train.train_state import EMA

    ema = EMA(decay=0.9999, tau=2000.0)
    for updates, want in [(1, 0.9999 * (1 - np.exp(-1 / 2000))),
                          (2000, 0.9999 * (1 - np.exp(-1.0))),
                          (100000, 0.9999 * (1 - np.exp(-50.0)))]:
        got = float(ema.rate(jnp.asarray(updates, jnp.int32)))
        assert abs(got - want) < 1e-6, (updates, got, want)

    # one update moves the shadow toward the new value by (1 - d)
    shadow = {"w": jnp.ones((4,), jnp.float32)}
    new = {"w": jnp.zeros((4,), jnp.float32)}
    out = ema.update(shadow, new, jnp.asarray(1, jnp.int32))
    d = float(ema.rate(jnp.asarray(1, jnp.int32)))
    np.testing.assert_allclose(np.asarray(out["w"]), d, rtol=1e-6)


def test_loss_trajectory_fast(tiny_setup):
    """Fast learning-quality gate in the default suite: 40 fixed-batch steps
    on the tiny graph must cut the total loss by >=25% and keep every
    component finite. Complements the AYOLO_SLOW_TESTS single-batch-overfit
    proof (tests/test_overfit.py) and the fixture-VOC mAP golden
    (tests/test_training_golden.py) with something that runs every time."""
    model, variables, loss_fn, _ = tiny_setup
    # short warmup so the lr is live within the 40-step budget (the fixture's
    # default 1000-iter warmup ramp would keep lr ~0 here)
    tx = build_optimizer(
        variables["params"],
        {"optimizer_params": {"lr": 0.01}, **HYP, "weight_decay": 0.0,
         "warmup_min_iters": 5, "warmup_epochs": 0.1, "lrf": 1.0},
        epochs=1, steps_per_epoch=40, batch_size=8,
    )
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.float32))
    images, targets, mask = _batch()

    first = last = None
    for i in range(40):
        state, items = step(state, images, targets, mask)
        if i == 0:
            first = np.asarray(items)
        last = np.asarray(items)
    assert np.isfinite(first).all() and np.isfinite(last).all(), (first, last)
    assert last[3] < 0.75 * first[3], f"loss {first[3]:.4f} -> {last[3]:.4f}: no learning"
