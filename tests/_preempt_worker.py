"""Worker for tests/test_preempt.py: a long YoloTrainer run that expects to
be SIGTERM'd mid-training and must exit CLEANLY (checkpoint + return) via
the AbstractTrainer graceful-preemption path.

Beyond-reference: the upstream trainer has no preemption handling at all
(SURVEY §5 — "no elastic training"); a killed run loses everything since
the last epoch checkpoint and dies with a stack trace.

Run: python tests/_preempt_worker.py <log_dir>
Prints "EPOCH_DONE <n>" per epoch and, if train() returns,
"TRAIN_RETURNED preempted=<bool> epoch=<n>".
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from ayolov2_tpu.data import DataLoader, DetectionDataset  # noqa: E402
from ayolov2_tpu.models import build_model, init_model  # noqa: E402
from ayolov2_tpu.train.trainer import YoloTrainer  # noqa: E402
from ayolov2_tpu.utils.config import load_yaml  # noqa: E402
from tests.test_train_step import TINY_CFG  # noqa: E402

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"


class MarkerTrainer(YoloTrainer):
    def on_epoch_end(self, epoch: int) -> None:
        super().on_epoch_end(epoch)
        print(f"EPOCH_DONE {epoch}", flush=True)


def main() -> None:
    log_dir = sys.argv[1]
    cfg = load_yaml("res/configs/cfg/train_config.yaml")
    cfg["train"].update(
        epochs=500, batch_size=4, image_size=64, workers=1, patience=10_000,
        auto_anchor=False, label_type="labels", half=False, plot=False,
    )
    model = build_model(TINY_CFG, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    ds = DetectionDataset(VOC_TRAIN, img_size=64, batch_size=4, rect=False,
                          stride=32, n_skip=8)
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    trainer = MarkerTrainer(
        model, variables, cfg, loader, val_loader=None, log_dir=log_dir,
        model_cfg_dict={"n_classes": 20},
    )
    trainer.train()
    print(
        f"TRAIN_RETURNED preempted={trainer.is_preempted} epoch={trainer.current_epoch}",
        flush=True,
    )


if __name__ == "__main__":
    main()
