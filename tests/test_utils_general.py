"""Tests for general utilities."""

import numpy as np

from ayolov2_tpu.utils.general import (
    TimeChecker,
    box_candidates,
    check_img_size,
    increment_path,
    labels_to_class_weights,
    labels_to_image_weights,
    make_divisible,
    resample_segments,
    segment2box,
    segments2boxes,
)


def test_make_divisible():
    assert make_divisible(100, 32) == 128
    assert make_divisible(128, 32) == 128
    assert make_divisible(0, 32) == 0
    assert check_img_size(639, 32) == 640


def test_segment2box():
    seg = np.array([[10.0, 20.0], [30.0, 40.0], [-5.0, 5.0]])
    np.testing.assert_allclose(segment2box(seg), [10, 20, 30, 40])


def test_segments2boxes():
    segs = [np.array([[0.0, 0.0], [10.0, 20.0]])]
    np.testing.assert_allclose(segments2boxes(segs), [[5, 10, 10, 20]])


def test_resample_segments():
    segs = [np.array([[0.0, 0.0], [10.0, 10.0]])]
    out = resample_segments(segs, n=5)
    assert out[0].shape == (5, 2)
    np.testing.assert_allclose(out[0][-1], [10.0, 10.0])


def test_box_candidates():
    box1 = np.array([[0.0], [0.0], [100.0], [100.0]])
    box2_good = np.array([[0.0], [0.0], [50.0], [50.0]])
    box2_tiny = np.array([[0.0], [0.0], [1.0], [1.0]])
    assert box_candidates(box1, box2_good)[0]
    assert not box_candidates(box1, box2_tiny)[0]


def test_class_and_image_weights():
    labels = [np.array([[0, 0.5, 0.5, 0.1, 0.1]]), np.array([[1, 0.5, 0.5, 0.1, 0.1]] * 3)]
    cw = labels_to_class_weights(labels, nc=2)
    assert cw[0] > cw[1]  # rarer class weighted higher
    np.testing.assert_allclose(cw.sum(), 1.0)
    iw = labels_to_image_weights(labels, nc=2, class_weights=cw)
    assert iw.shape == (2,)


def test_increment_path(tmp_path):
    p = tmp_path / "exp"
    assert increment_path(p) == str(p)
    p.mkdir()
    assert increment_path(p) == str(p) + "2"


def test_time_checker():
    t = TimeChecker("unit", ignore_thr=0.0)
    t.add("phase1")
    t.add("phase2")
    assert t.total_time >= 0
    assert "phase1" in str(t)


def test_init_seeds_deterministic():
    import random

    from ayolov2_tpu.utils.general import init_seeds

    g1 = init_seeds(7)
    a = (random.random(), np.random.rand(), g1.random())
    g2 = init_seeds(7)
    b = (random.random(), np.random.rand(), g2.random())
    assert a == b


def test_cfg_and_data_config_inventory_matches_reference():
    """Every cfg/data YAML the reference ships exists here under the same
    name and parses with the expected sections (finetune/experimental/
    simclr presets, coco_repr)."""
    import os

    import yaml as _yaml

    ref_root = "/root/reference/res/configs"
    if not os.path.isdir(ref_root):
        import pytest as _pytest

        _pytest.skip("reference mount unavailable")
    for sub, required in [("cfg", None), ("data", {"train_path", "val_path"})]:
        ref = sorted(f for f in os.listdir(f"{ref_root}/{sub}") if f.endswith(".yaml"))
        ours_dir = f"res/configs/{sub}"
        missing = [f for f in ref if not os.path.exists(f"{ours_dir}/{f}")]
        assert not missing, f"{sub} configs missing vs reference: {missing}"
        for f in ref:
            cfg = _yaml.safe_load(open(f"{ours_dir}/{f}"))
            assert isinstance(cfg, (dict, list)) and cfg, f
            if required and isinstance(cfg, dict):
                assert required <= set(cfg), (f, set(cfg))
            if sub == "cfg" and isinstance(cfg, dict) and "train" in cfg:
                assert "hyper_params" in cfg or "rl_type" in str(cfg), f
