"""Pallas stem-conv kernel parity (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.ops.stem_pallas import (
    pack_stem_weights,
    stem_conv_slabs,
    to_polyphase_slabs,
)


def test_stem_kernel_matches_lax_conv():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (1, 640, 640, 3), dtype=np.uint8)
    kernel = rng.standard_normal((6, 6, 3, 32)).astype(np.float32) * 0.1
    bias = rng.standard_normal(32).astype(np.float32) * 0.1

    x = jnp.asarray(imgs, jnp.float32) / 255.0
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = ref * jax.nn.sigmoid(ref)

    slabs = to_polyphase_slabs(imgs)
    w, b = pack_stem_weights(kernel, bias)
    got = stem_conv_slabs(
        jnp.asarray(slabs), jnp.asarray(w), jnp.asarray(b), cout=32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=2e-2, rtol=1e-2
    )


def test_polyphase_slab_layout():
    """slab[b, j, a, r, t, l] == IMG[b, 2*(ROWS*j-1+t)+a, 6*(l-1)+r]."""
    from ayolov2_tpu.ops.stem_pallas import LANES, NBLK, ROWS, SLAB_T

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 640, 640, 3), dtype=np.uint8)
    flat = imgs.reshape(1, 640, 1920)
    slabs = to_polyphase_slabs(imgs)
    assert slabs.shape == (1, NBLK, 2, 6, SLAB_T, LANES)
    for j in (0, NBLK // 2, NBLK - 1):
        for a in (0, 1):
            for r in (0, 3, 5):
                for t in (0, SLAB_T - 1):
                    g = 2 * (ROWS * j - 1 + t) + a
                    for lane in (0, 1, 160, LANES - 1):
                        col = 6 * (lane - 1) + r
                        want = (
                            flat[0, g, col]
                            if 0 <= g < 640 and 0 <= col < 1920
                            else 0
                        )
                        assert slabs[0, j, a, r, t, lane] == want, (j, a, r, t, lane)
