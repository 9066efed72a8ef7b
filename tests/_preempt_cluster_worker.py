"""Worker for tests/test_preempt.py::test_cluster_preempt_consensus: one
process of a 2-process jax.distributed CPU cluster running the REAL
YoloTrainer. The parent SIGTERMs only ONE process; the preempt flag must
ride the epoch-end ``host_broadcast_max`` stop consensus so BOTH processes
leave the collective train step together and exit cleanly (a lone host
breaking out would deadlock the other in the next all-reduce).

Run: python tests/_preempt_cluster_worker.py <pid> <n_procs> <port> <log_dir>
Prints "EPOCH_DONE <n>" per epoch and "TRAIN_RETURNED preempted=<bool>
early_stop=<bool> epoch=<n>" when train() returns.
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

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"


def main() -> None:
    pid, n_procs, port, log_dir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["AYOLO_NUM_PROCS"] = str(n_procs)
    os.environ["AYOLO_PROC_ID"] = str(pid)
    os.environ["AYOLO_COORDINATOR"] = f"localhost:{port}"

    from ayolov2_tpu.parallel import initialize_distributed

    initialize_distributed()
    assert jax.process_count() == n_procs, jax.process_count()

    import jax.numpy as jnp

    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.train.trainer import YoloTrainer
    from ayolov2_tpu.utils.config import load_yaml
    from tests.test_train_step import TINY_CFG

    class MarkerTrainer(YoloTrainer):
        def on_epoch_end(self, epoch: int) -> None:
            super().on_epoch_end(epoch)
            print(f"EPOCH_DONE {epoch}", flush=True)

    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=100, batch_size=8, image_size=64, workers=1, patience=10_000,
        auto_anchor=False, label_type="labels", half=False, plot=False,
        # ZeRO-sharded state ON: every per-epoch last.ckpt save must gather
        # the cross-process-sharded leaves with ALL hosts participating
        # (ADVICE r4 #1) — a host-0-only gather deadlocks this cluster
        fsdp=True, fsdp_min_elems=2048,
    )
    model = build_model(TINY_CFG, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    # batch_size is the GLOBAL batch: the sharded DataLoader yields
    # batch/world per host and make_global_batch reassembles to 8 over the
    # 8-device mesh (4 virtual devices x 2 processes)
    ds = DetectionDataset(VOC_TRAIN, img_size=64, batch_size=8, rect=False,
                          stride=32, n_skip=8)
    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=True,
                        shard=(jax.process_index(), jax.process_count()))
    trainer = MarkerTrainer(
        model, variables, cfg, loader, val_loader=None, log_dir=log_dir,
        model_cfg_dict={"n_classes": 20},
    )
    trainer.train()
    print(
        f"TRAIN_RETURNED preempted={trainer.is_preempted} "
        f"early_stop={trainer.is_early_stop} epoch={trainer.current_epoch}",
        flush=True,
    )


if __name__ == "__main__":
    main()
