"""Pallas greedy-NMS kernel: keep-set parity with the XLA scan.

Runs in interpreter mode on the CPU test mesh; the compiled kernel is
exercised on real TPU hardware by the serving benchmarks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.ops.nms import _box_iou_matrix, _greedy_suppress
from ayolov2_tpu.ops.nms_pallas import greedy_suppress_pallas, pallas_supported


def _random_iou(k, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 640, (k, 2)).astype(np.float32)
    wh = rng.uniform(5, 120, (k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    return _box_iou_matrix(boxes)


@pytest.mark.parametrize("k,seed", [(128, 0), (256, 1), (512, 2)])
def test_pallas_greedy_matches_xla(k, seed):
    iou = _random_iou(k, seed)
    valid = jnp.asarray(np.random.default_rng(seed).random(k) > 0.1)
    ref = _greedy_suppress(iou, valid, 0.65)
    got = greedy_suppress_pallas(iou, valid, 0.65, interpret=not pallas_supported())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_greedy_dense_overlaps():
    # pathological: everything overlaps everything -> only first valid survives
    k = 128
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 100.0, 100.0]]), (k, 1))
    iou = _box_iou_matrix(boxes)
    valid = jnp.ones(k, bool).at[0].set(False)
    got = greedy_suppress_pallas(iou, valid, 0.5, interpret=not pallas_supported())
    ref = _greedy_suppress(iou, valid, 0.5)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert int(np.asarray(got).sum()) == 1 and bool(np.asarray(got)[1])
