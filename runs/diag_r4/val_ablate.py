"""Memorization-plateau defect hunt: ablate val config on the finished
1500-epoch run's last.ckpt. All CPU fp32 unless noted."""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from ayolov2_tpu.utils.checkpoint import load_checkpoint
import numpy as np

sys.path.insert(0, "/root/repo")
from ayolov2_tpu.models import build_model
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.eval import YoloValidator

RUN = "runs/golden_r4_mem/train/2026_0818_runs"
ck = load_checkpoint(f"{RUN}/weights/last.ckpt")

def to_jnp(t):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32), t)

cfg = parse_model_config(f"{RUN}/model.yaml")
model = build_model(cfg, dtype=jnp.float32, nc=20)
VAL = "/root/reference/tests/res/datasets/VOC/images/train"
names = json.load(open("/dev/stdin")) if False else None
class_names = ["aeroplane","bicycle","bird","boat","bottle","bus","car","cat","chair","cow","diningtable","dog","horse","motorbike","person","pottedplant","sheep","sofa","train","tvmonitor"]

def run(tag, tree, rect, half, conf=0.001):
    common = dict(img_size=320, batch_size=16, stride=32, label_type="labels", cache_images=None)
    ds = DetectionDataset(VAL, rect=rect, pad=0.5 if rect else 0.0, **common)
    dl = DataLoader(ds, batch_size=16, max_labels_per_image=64)
    variables = {"params": to_jnp(tree["params"]), "batch_stats": to_jnp(tree["batch_stats"])}
    v = YoloValidator(model, variables, dl, class_names=class_names,
                      cfg={"half": half, "conf_t": conf})
    r = v.validation()
    print(f"[{tag}] mP={r['mp']:.3f} mR={r['mr']:.3f} mAP50={r['map50']:.4f} mAP50:95={r['map50_95']:.4f}", flush=True)
    return r

res = {}
res["ema_rect_bf16"] = run("ema rect bf16 (repro)", ck["ema"], True, True)
res["ema_rect_f32"]  = run("ema rect f32", ck["ema"], True, False)
res["raw_rect_f32"]  = run("RAW rect f32", ck["model"], True, False)
res["ema_sq_f32"]    = run("ema SQUARE f32", ck["ema"], False, False)
json.dump({k: {kk: r[kk] for kk in ("mp","mr","map50","map50_95")} for k, r in res.items()},
          open("runs/diag_r4/val_ablate.json","w"), indent=1)
