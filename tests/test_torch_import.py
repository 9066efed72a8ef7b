"""Torch weight import tests: exact round-trip through torch naming/layout."""

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.utils.torch_import import (
    _torch_name_to_path,
    pytree_to_torch_state_dict,
    torch_state_dict_to_pytree,
)


def test_name_mapping():
    assert _torch_name_to_path("model.0.conv.weight") == (("model_0", "conv"), "weight")
    assert _torch_name_to_path("model.2.m.0.cv1.conv.weight") == (
        ("model_2", "m0", "cv1", "conv"), "weight")
    assert _torch_name_to_path("model.24.m.1.bias") == (("model_24", "m1"), "bias")
    assert _torch_name_to_path("model.4.bn.running_mean") == (("model_4", "bn"), "running_mean")
    assert _torch_name_to_path("model.7.1.conv.weight") == (("model_7_1", "conv"), "weight")


def test_roundtrip_exact():
    """pytree -> torch state_dict -> pytree is the identity (all leaves)."""
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    params, stats = variables["params"], variables["batch_stats"]

    sd = pytree_to_torch_state_dict(params, stats)
    assert "model.0.conv.weight" in sd
    assert sd["model.0.conv.weight"].ndim == 4
    assert any(k.startswith("model.24.m.") or k.startswith("model.23.m.") for k in sd)

    # zero templates: everything must come from the state_dict
    zero_params = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    zero_stats = jax.tree_util.tree_map(lambda x: np.zeros_like(x), stats)
    got_p, got_s, n, unmatched = torch_state_dict_to_pytree(sd, zero_params, zero_stats)
    assert not unmatched, unmatched[:5]
    n_leaves = len(jax.tree_util.tree_leaves(params)) + len(jax.tree_util.tree_leaves(stats))
    assert n == n_leaves

    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(got_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(got_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_forward_equivalence():
    """Imported weights give bit-identical forward output."""
    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    sd = pytree_to_torch_state_dict(variables["params"], variables["batch_stats"])

    zero = {
        "params": jax.tree_util.tree_map(np.zeros_like, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(np.zeros_like, variables["batch_stats"]),
    }
    p, s, _, _ = torch_state_dict_to_pytree(sd, zero["params"], zero["batch_stats"])

    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
    ref, _ = model.apply(variables, x, training=False)
    got, _ = model.apply({"params": p, "batch_stats": s}, x, training=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_torch_tensor_inputs():
    """Actual torch tensors (not numpy) import correctly."""
    import torch

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    sd_np = pytree_to_torch_state_dict(variables["params"], variables["batch_stats"])
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    p, s, n, unmatched = torch_state_dict_to_pytree(
        sd_t, variables["params"], variables["batch_stats"]
    )
    assert not unmatched and n > 0


def test_load_variables_pt_path(tmp_path):
    """Every CLI accepts a reference .pt directly: load_variables imports it.

    Mirrors the reference loaders' .pt handling (val.py:241-278 weight arg,
    torch_utils.py:241-252 ema-branch preference)."""
    import torch

    from ayolov2_tpu.utils.checkpoint import load_variables

    cfg = "res/configs/model/yolov5n.yaml"
    model = build_model(cfg, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(1), img_size=64)
    sd_np = pytree_to_torch_state_dict(variables["params"], variables["batch_stats"])
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    pt = tmp_path / "yolov5n_ref.pt"
    # reference checkpoint shape: {"model": ..., "ema": state_dict, "epoch": N}
    torch.save({"model": None, "ema": sd_t, "epoch": 7}, pt)

    got, meta = load_variables(str(pt), prefer_ema=True, model_cfg=cfg)
    assert meta.get("model_cfg")  # downstream CLIs rebuild the graph from this
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(got["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["batch_stats"]),
        jax.tree_util.tree_leaves(got["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a .pt without a model cfg must fail loudly, not mis-load
    import pytest

    with pytest.raises(ValueError, match="model-cfg"):
        load_variables(str(pt), prefer_ema=True)
