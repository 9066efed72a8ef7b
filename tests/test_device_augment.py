"""On-device training augmentation: planner/renderer parity vs the host path.

The device path (datasets.plan_item + data/device_augment.py) must produce:
  - LABELS bit-identical to the host get_item (same RNG stream, same shared
    geometry helpers — any drift here silently corrupts training);
  - IMAGES within interpolation rounding of the host cv2 pipeline
    (cv2.warpAffine uses 5-bit fixed-point bilinear weights and cv2 HSV
    round-trips through integer H/S/V; the renderer keeps float precision
    and rounds once — calibrated band: mean|d| < 1.5, frac(|d|>3) < 6%).

Reference hot loop being replaced: /root/reference/scripts/data_loader/
data_loader.py:613-724 (__getitem__), :726-830 (mosaic),
scripts/augmentation/yolo_augmentation.py:397-422 (HSV).
"""

from pathlib import Path

import numpy as np
import pytest

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.data.device_augment import DeviceAugmenter, PlanBatch, collate_plans

VOC = "/root/reference/tests/res/datasets/VOC/images/train"
needs_fixtures = pytest.mark.skipif(
    not Path(VOC).exists(), reason="fixture datasets unavailable"
)

FULL_AUG = dict(
    augment=True, mosaic=1.0, mixup=0.0, degrees=5.0, translate=0.1,
    scale=0.5, shear=2.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
    copy_paste=0.0,
)
FLIP_POLICY = [{"policy": {"HorizontalFlip": {"p": 0.5}}, "prob": 1.0}]


def _pair(ya=None, policies=None, **kw):
    common = dict(img_size=128, batch_size=4, rect=False, stride=32, n_skip=4,
                  cache_images="mem", **kw)
    host = DetectionDataset(VOC, yolo_augmentation=ya, augmentation=policies, **common)
    plan = DetectionDataset(VOC, yolo_augmentation=ya, augmentation=policies, **common)
    plan.enable_device_aug(resident=True)
    return host, plan


def _render1(aug, plan, labels, path, shapes):
    return np.asarray(aug(collate_plans([(plan, labels, path, shapes)], 1, 64)))[0]


def _assert_close(img_h, img_d, mean_tol=1.5, frac3_tol=0.06):
    d = np.abs(img_h.astype(np.int32) - img_d.astype(np.int32))
    assert d.mean() <= mean_tol, f"mean |diff| {d.mean():.3f}"
    assert (d > 3).mean() <= frac3_tol, f"frac(|diff|>3) {(d > 3).mean():.4f}"


@needs_fixtures
def test_mosaic_full_aug_parity():
    """Mosaic + perspective + HSV + flip policy: labels exact, pixels in the
    rounding band, over a grid of (index, salt)."""
    host, plan_ds = _pair(FULL_AUG, FLIP_POLICY)
    aug = DeviceAugmenter(128, 128, 1, resident_frames=plan_ds.resident_frames)
    for idx in range(6):
        for salt in (0, 1):
            img_h, lab_h, path_h, shp_h = host.get_item(idx, salt)
            plan, lab_p, path_p, shp_p = plan_ds.plan_item(idx, salt)
            assert path_h == path_p and shp_h == shp_p
            np.testing.assert_array_equal(lab_h, lab_p)
            _assert_close(img_h, _render1(aug, plan, lab_p, path_p, shp_p))


@needs_fixtures
def test_letterbox_no_aug_bit_exact():
    """augment=False (the memorize-golden regime): square letterbox of the
    pre-resized cached frame is a pure integer paste — device == host
    BIT-EXACT, labels and shapes metadata identical."""
    host, plan_ds = _pair(None)
    aug = DeviceAugmenter(128, 128, 1, resident_frames=plan_ds.resident_frames)
    for idx in range(6):
        img_h, lab_h, path_h, shp_h = host.get_item(idx, 0)
        plan, lab_p, path_p, shp_p = plan_ds.plan_item(idx, 0)
        np.testing.assert_array_equal(lab_h, lab_p)
        assert shp_h == shp_p
        img_d = _render1(aug, plan, lab_p, path_p, shp_p)
        np.testing.assert_array_equal(img_h, img_d)


@needs_fixtures
def test_mixup_parity():
    """mixup > 0: pair dim 2, triggered samples blend with the host's exact
    Beta draw + uint8 truncation; labels (concatenated) stay exact."""
    ya = dict(FULL_AUG, mixup=0.7, degrees=3.0, shear=1.0)
    host, plan_ds = _pair(ya)
    aug = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames)
    n_mix = 0
    for idx in range(6):
        img_h, lab_h, path_h, shp_h = host.get_item(idx, 0)
        plan, lab_p, path_p, shp_p = plan_ds.plan_item(idx, 0)
        np.testing.assert_array_equal(lab_h, lab_p)
        assert plan["minv"].shape == (2, 3, 3)
        if float(plan["blend"]) < 1.0:
            n_mix += 1
        _assert_close(img_h, _render1(aug, plan, lab_p, path_p, shp_p))
    assert n_mix >= 2  # p=0.7 over 6 items: mixup actually exercised


@needs_fixtures
def test_streaming_equals_resident():
    """Streaming (frames shipped per batch) renders the identical pixels as
    resident (frames gathered from the one-time HBM upload)."""
    ya = dict(FULL_AUG, mixup=0.5)
    _, res_ds = _pair(ya)
    stream_ds = DetectionDataset(VOC, img_size=128, batch_size=4, rect=False,
                                 stride=32, n_skip=4, cache_images="mem",
                                 yolo_augmentation=ya)
    stream_ds.enable_device_aug(resident=False)
    aug_r = DeviceAugmenter(128, 128, 2, resident_frames=res_ds.resident_frames)
    aug_s = DeviceAugmenter(128, 128, 2)
    for idx in (0, 2, 4):
        plan_r, lab_r, p, shp = res_ds.plan_item(idx, 0)
        plan_s, lab_s, _, _ = stream_ds.plan_item(idx, 0)
        np.testing.assert_array_equal(lab_r, lab_s)
        assert plan_s["src"].shape == (2, 4, 128, 128, 3)
        img_r = _render1(aug_r, plan_r, lab_r, p, shp)
        img_s = _render1(aug_s, plan_s, lab_s, p, shp)
        np.testing.assert_array_equal(img_r, img_s)


@needs_fixtures
def test_loader_plan_batches_match_host_targets():
    """DataLoader in plan mode: PlanBatch targets/masks are bit-identical to
    the host loader's with the same seed/epoch — the train step sees the
    exact same labels either way."""
    host, plan_ds = _pair(FULL_AUG, FLIP_POLICY)
    dl_h = DataLoader(host, batch_size=4, shuffle=True, drop_last=True, workers=1)
    dl_p = DataLoader(plan_ds, batch_size=4, shuffle=True, drop_last=True, workers=1)
    for bh, bp in zip(dl_h, dl_p):
        assert isinstance(bp, PlanBatch)
        assert bp.src is None  # resident mode: indices only
        np.testing.assert_array_equal(bh.targets, bp.targets)
        np.testing.assert_array_equal(bh.target_mask, bp.target_mask)
        assert bh.paths == bp.paths
        assert bp.minv.shape == (4, 1, 3, 3)
        assert bp.rects.dtype == np.int32


AXIS_ALIGNED = dict(FULL_AUG, degrees=0.0, shear=0.0)  # the reference default


@needs_fixtures
def test_separable_matches_gather():
    """The MXU-matmul renderer == the gather renderer on axis-aligned plans
    (the reference's default hyp): same taps, same weights, different
    summation order — a pre-HSV rounding flip amplified by the HSV gain
    (<= 1.7x) bounds the drift at 2 LSB on a vanishing fraction of pixels
    (measured: worst 2, ~4e-5 of pixels). Covers mosaic, letterbox, mixup."""
    ya = dict(AXIS_ALIGNED, mosaic=0.5, mixup=0.5)
    _, plan_ds = _pair(ya)
    aug_g = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames,
                            mode="gather")
    aug_s = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames,
                            mode="separable", dtype="float32")
    for idx in range(6):
        for salt in (0, 1):
            plan, lab, path, shp = plan_ds.plan_item(idx, salt)
            img_g = _render1(aug_g, plan, lab, path, shp)
            img_s = _render1(aug_s, plan, lab, path, shp)
            d = np.abs(img_g.astype(np.int32) - img_s.astype(np.int32))
            assert d.max() <= 2, f"idx {idx} salt {salt}: max |diff| {d.max()}"
            assert (d > 0).mean() < 0.001, f"idx {idx} salt {salt}: {(d > 0).mean():.5f} pixels differ"


@needs_fixtures
def test_separable_bf16_matches_f32():
    """The bf16-matmul separable renderer (the default — MXU at ~4x the f32
    rate) vs the f32 renderer: uint8 pixels are exact in bf16, only the
    bilinear weights round (2^-9 relative, tighter than cv2's 5-bit
    fixed-point weights on the host path), f32 accumulation either way.
    Drift bound, measured on XLA:CPU (true f32 matmuls — on TPU the default
    matmul precision is already bf16 multiplies, so both dtypes coincide
    there): worst max|d| 6, frac(|d|>3) <= 7.5e-4 across a 12-cell grid —
    weight rounding (~0.5 LSB pre-round) lands on mixup's floor() and HSV's
    gain (<= 1.7x) boundaries. The HOST parity contract (mean <= 1.5,
    frac(>3) <= 6%, test_separable_matches_host) is the binding one and
    holds for both dtypes."""
    ya = dict(AXIS_ALIGNED, mosaic=0.5, mixup=0.5)
    _, plan_ds = _pair(ya)
    aug_b = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames,
                            mode="separable", dtype="bfloat16")
    aug_f = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames,
                            mode="separable", dtype="float32")
    for idx in range(6):
        for salt in (0, 1):
            plan, lab, path, shp = plan_ds.plan_item(idx, salt)
            img_b = _render1(aug_b, plan, lab, path, shp)
            img_f = _render1(aug_f, plan, lab, path, shp)
            d = np.abs(img_b.astype(np.int32) - img_f.astype(np.int32))
            assert d.max() <= 8, f"idx {idx} salt {salt}: max |diff| {d.max()}"
            assert (d > 3).mean() <= 2e-3, f"idx {idx} salt {salt}: {(d > 3).mean():.5f} pixels differ >3"


@needs_fixtures
def test_separable_matches_host():
    """Separable renderer vs the host cv2 pipeline under the default
    (axis-aligned) hyp — same rounding band as the gather renderer."""
    host, plan_ds = _pair(AXIS_ALIGNED, FLIP_POLICY)
    aug = DeviceAugmenter(128, 128, 1, resident_frames=plan_ds.resident_frames,
                          mode="separable")
    for idx in range(6):
        img_h, lab_h, path_h, shp_h = host.get_item(idx, 0)
        plan, lab_p, path_p, shp_p = plan_ds.plan_item(idx, 0)
        np.testing.assert_array_equal(lab_h, lab_p)
        _assert_close(img_h, _render1(aug, plan, lab_p, path_p, shp_p))


@needs_fixtures
def test_auto_mode_selection():
    """mode='auto' picks separable for axis-aligned batches and gather for
    rotated ones; mode='separable' refuses rotated plans loudly."""
    _, aligned_ds = _pair(AXIS_ALIGNED)
    _, rotated_ds = _pair(FULL_AUG)  # degrees=5, shear=2
    aug = DeviceAugmenter(128, 128, 1, resident_frames=aligned_ds.resident_frames)
    plan, lab, path, shp = aligned_ds.plan_item(0, 0)
    _render1(aug, plan, lab, path, shp)
    assert set(aug._render_fns) == {"separable"}
    plan_r, lab_r, path_r, shp_r = rotated_ds.plan_item(0, 0)
    aug2 = DeviceAugmenter(128, 128, 1, resident_frames=rotated_ds.resident_frames)
    _render1(aug2, plan_r, lab_r, path_r, shp_r)
    assert set(aug2._render_fns) == {"gather"}
    aug3 = DeviceAugmenter(128, 128, 1, resident_frames=rotated_ds.resident_frames,
                           mode="separable")
    with pytest.raises(ValueError, match="axis-aligned"):
        _render1(aug3, plan_r, lab_r, path_r, shp_r)


@needs_fixtures
def test_eligibility_gate():
    ya_cp = dict(FULL_AUG, copy_paste=0.5)
    ds = DetectionDataset(VOC, img_size=128, batch_size=4, rect=False, stride=32,
                          n_skip=4, yolo_augmentation=ya_cp)
    with pytest.raises(ValueError, match="copy_paste"):
        ds.enable_device_aug()
    ds2 = DetectionDataset(VOC, img_size=128, batch_size=4, rect=False, stride=32,
                           n_skip=4, yolo_augmentation=FULL_AUG,
                           augmentation=[{"policy": {"Blur": {"p": 0.01}}, "prob": 1.0}])
    with pytest.raises(ValueError, match="Blur"):
        ds2.enable_device_aug()
    ds3 = DetectionDataset(VOC, img_size=128, batch_size=4, rect=True, stride=32,
                           n_skip=4, yolo_augmentation=FULL_AUG)
    with pytest.raises(ValueError, match="rect"):
        ds3.enable_device_aug()


@needs_fixtures
def test_trainer_device_aug_smoke(tmp_path):
    """One epoch of the real YoloTrainer with device augmentation ON
    (resident frames): renders PlanBatches on device inside training_step,
    trains, checkpoints."""
    import jax
    import jax.numpy as jnp

    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.train.trainer import YoloTrainer
    from ayolov2_tpu.utils.config import load_yaml
    from tests.test_train_step import TINY_CFG

    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=1, batch_size=8, image_size=64, workers=1, patience=5,
        auto_anchor=False, label_type="labels", half=False, plot=False,
        device_aug=True,
    )
    model = build_model(TINY_CFG, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ya = dict(FULL_AUG, mosaic=0.5)
    ds = DetectionDataset(VOC, img_size=64, batch_size=8, rect=False, stride=32,
                          n_skip=8, cache_images="mem", yolo_augmentation=ya)
    ds.enable_device_aug(resident=True)
    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=True, workers=1)
    trainer = YoloTrainer(
        model, variables, cfg, loader, val_loader=None, log_dir=str(tmp_path),
        model_cfg_dict={"n_classes": 20},
    )
    trainer.train()
    assert int(trainer.state.step) == len(loader)
    assert np.isfinite(trainer.mloss).all()
    assert (tmp_path / "weights" / "last.ckpt").exists()


@needs_fixtures
def test_sharded_render_matches_local():
    """DP-sharded SPMD render over the 8-device mesh (frames replicated,
    geometry + output sharded on 'data'): matches the local renderer within
    a 1-LSB rounding flip on a vanishing fraction of pixels (different
    executable, different fusion order), and the output is born with the
    train step's input sharding — the augmentation program scales with the
    mesh instead of serializing on device 0 (the multi-chip input-pipeline
    path the trainer now uses)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ayolov2_tpu.parallel import get_mesh

    mesh = get_mesh()
    n_dev = mesh.devices.size
    ya = dict(AXIS_ALIGNED, mosaic=0.5, mixup=0.5)
    _, plan_ds = _pair(ya)
    items = [plan_ds.plan_item(i % 6, i // 6) for i in range(n_dev)]
    batch = collate_plans(items, n_dev, 64)
    aug_l = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames)
    aug_m = DeviceAugmenter(128, 128, 2, resident_frames=plan_ds.resident_frames,
                            mesh=mesh)
    out_l = np.asarray(aug_l(batch))
    out_m = aug_m(batch)
    assert out_m.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), out_m.ndim)
    assert len({d.device for d in out_m.addressable_shards}) == n_dev
    # same math, different executable: fusion order may flip a rounding
    # boundary on a vanishing fraction of pixels (measured 3/393k, 1 LSB)
    d = np.abs(out_l.astype(np.int32) - np.asarray(out_m).astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() <= 1e-4, (d.max(), (d > 0).mean())

    # the gather renderer shards the same way (rotated plans)
    _, rot_ds = _pair(FULL_AUG)
    items_r = [rot_ds.plan_item(i % 6, 0) for i in range(n_dev)]
    batch_r = collate_plans(items_r, n_dev, 64)
    aug_lr = DeviceAugmenter(128, 128, 1, resident_frames=rot_ds.resident_frames)
    aug_mr = DeviceAugmenter(128, 128, 1, resident_frames=rot_ds.resident_frames,
                             mesh=mesh)
    out_lr = np.asarray(aug_lr(batch_r))
    out_mr = aug_mr(batch_r)
    assert out_mr.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), out_mr.ndim)
    d = np.abs(out_lr.astype(np.int32) - np.asarray(out_mr).astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() <= 1e-4, (d.max(), (d > 0).mean())
