"""Worker for tests/test_multihost.py: one process of a 2-process CPU
cluster running a mesh-sharded train step on its per-host loader shard.

Certifies the reference's DDP contract (train.py:22-26 env bootstrap,
data_loader_utils.py:67,101-103 per-rank batch split) the TPU-native way:
jax.distributed + make_global_batch + pjit over the global mesh.

Run: python tests/_multihost_worker.py <pid> <num_processes> <port> [n_items] [global_bs]
Prints one "ITEMS [lbox, lobj, lcls, total]" line per batch of one epoch,
then "N_BATCHES <k>". ``n_items`` not divisible by the process count
exercises the equal-length shard padding (a host with one extra batch would
call the collective step alone and deadlock — DistributedSampler semantics,
data_loader_utils.py:101-103).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


class ToyDataset:
    """Deterministic synthetic (img, labels, path, shapes) items."""

    def __init__(self, n: int = 8):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        labels = np.array([[i % 6, 0.5, 0.5, 0.25, 0.25]], np.float32)
        return img, labels, f"img{i}", ((64, 64), ((1.0, 1.0), (0.0, 0.0)))


def main() -> None:
    pid, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    n_items = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    global_bs = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    os.environ["AYOLO_NUM_PROCS"] = str(n_procs)
    os.environ["AYOLO_PROC_ID"] = str(pid)
    os.environ["AYOLO_COORDINATOR"] = f"localhost:{port}"

    # cluster init FIRST — some package modules build jnp constants at import
    # time, which would initialize the XLA backend prematurely
    from ayolov2_tpu.parallel import initialize_distributed

    initialize_distributed()
    assert jax.process_count() == n_procs, jax.process_count()

    import jax.numpy as jnp

    from ayolov2_tpu.data.loader import DataLoader
    from ayolov2_tpu.loss import ComputeLoss
    from ayolov2_tpu.models import build_model
    from ayolov2_tpu.parallel import (
        batch_sharding,
        get_mesh,
        make_global_batch,
        replicate,
        zero_sharding,
    )
    from ayolov2_tpu.train.optimizer import build_optimizer
    from ayolov2_tpu.train.train_state import create_train_state, make_train_step
    from tests.test_train_step import HYP, TINY_CFG
    mesh = get_mesh()

    model = build_model(TINY_CFG, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=True)
    loss_fn = ComputeLoss.from_hyp(np.asarray(model.head.stride_anchors()), 6, HYP)
    tx = build_optimizer(
        variables["params"], {"optimizer_params": {"lr": 0.01}, **HYP, "weight_decay": 5e-4},
        epochs=3, steps_per_epoch=10, batch_size=8,
    )
    # AYOLO_MH_FSDP=1: ZeRO-sharded state (parallel.zero_sharding) — large
    # leaves live split across the CLUSTER (each process holds only its
    # addressable shards), XLA all-gathers at use sites
    fsdp = os.environ.get("AYOLO_MH_FSDP") == "1"
    host_state = create_train_state(variables, tx)
    state_sharding = (
        zero_sharding(mesh, host_state, min_elems=2048) if fsdp else replicate(mesh)
    )
    state = jax.device_put(host_state, state_sharding)

    multi = n_procs > 1
    rep = replicate(mesh)
    step = jax.jit(
        make_train_step(model, loss_fn, tx, image_dtype=jnp.float32),
        in_shardings=(
            state_sharding,
            batch_sharding(mesh, 4),
            batch_sharding(mesh, 2) if multi else rep,
            batch_sharding(mesh, 1) if multi else rep,
        ),
        out_shardings=(state_sharding, rep),
    )

    loader = DataLoader(ToyDataset(n_items), batch_size=global_bs, shuffle=False,
                        shard=(jax.process_index(), jax.process_count()),
                        max_labels_per_image=4, workers=1)
    n_batches = 0
    for batch in loader:
        images, targets, mask = make_global_batch(mesh, batch.images, batch.targets, batch.target_mask)
        state, items = step(state, jnp.asarray(images), jnp.asarray(targets), jnp.asarray(mask))
        print("ITEMS", [float(v) for v in np.asarray(items)], flush=True)
        n_batches += 1
    print("N_BATCHES", n_batches, flush=True)


if __name__ == "__main__":
    main()
