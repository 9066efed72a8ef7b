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
    ROWS = 16
    NBLK, SLAB_T, LANES = 320 // ROWS, ROWS + 2, 322
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 640, 640, 3), dtype=np.uint8)
    flat = imgs.reshape(1, 640, 1920)
    slabs = to_polyphase_slabs(imgs, rows=ROWS)
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


def test_stem_kernel_small_size():
    """Parametric sizes: 64px input (out 32, single block)."""
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    kernel = rng.standard_normal((6, 6, 3, 16)).astype(np.float32) * 0.1
    bias = rng.standard_normal(16).astype(np.float32) * 0.1

    x = jnp.asarray(imgs, jnp.float32) / 255.0
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = ref * jax.nn.sigmoid(ref)

    slabs = to_polyphase_slabs(imgs, rows=32)
    w, b = pack_stem_weights(kernel, bias)
    got = stem_conv_slabs(
        jnp.asarray(slabs), jnp.asarray(w), jnp.asarray(b), cout=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=2e-2, rtol=1e-2
    )


def test_skip_stem_end_to_end():
    """pallas stem -> skip_stem apply == full apply (decoded outputs)."""
    from ayolov2_tpu.models import build_model, fuse_params, init_model

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20, fused=True)
    unfused = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(unfused, jax.random.PRNGKey(0), img_size=64)
    fused = fuse_params(variables)

    xf = jnp.asarray(imgs, jnp.float32) / 255.0
    ref, _ = model.apply(fused, xf, training=False)

    stem_k = np.asarray(fused["params"]["model_0"]["conv"]["kernel"])
    stem_b = np.asarray(fused["params"]["model_0"]["conv"]["bias"])
    w, b = pack_stem_weights(stem_k, stem_b)
    slabs = to_polyphase_slabs(imgs, rows=32)
    stem_out = stem_conv_slabs(
        jnp.asarray(slabs), jnp.asarray(w), jnp.asarray(b),
        cout=stem_k.shape[-1], out_dtype=jnp.float32, interpret=True,
    )
    got, _ = model.apply(fused, stem_out, training=False, skip_stem=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2, rtol=5e-2)
