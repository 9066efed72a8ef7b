"""Multi-chip data-parallel serving: one jitted program over a device mesh.

The reference scales inference by pinning one TRT engine per GPU process
(val.py --device / torchscript_runner per-device binaries); the TPU-native
shape is ONE program compiled over the whole mesh — XLA splits the batch
across chips over ICI, parameters stay replicated, and the fixed-shape
(bs, keep_top_k, 6) detections come back batch-sharded with zero
host-side gather logic.

Parameters are passed as a traced ARGUMENT (not closure-captured): keeps
the compile payload small for yolov5l/x through the remote-compile service
(CLAUDE.md: >150MB HLO constants are rejected) and lets the same compiled
program serve updated weights (e.g. after SWA/EMA swap) without a recompile.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh

from ayolov2_tpu.parallel.mesh import batch_sharding, replicate


def make_sharded_serving_fn(
    mesh: Mesh,
    model,
    variables: Dict[str, Any],
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    nms_box: int = 1000,
    image_dtype=None,
    img_hw: Optional[Tuple[int, int]] = None,
) -> Callable:
    """Build ``images -> (detections, counts)`` sharded over ``mesh``'s
    'data' axis.

    ``images`` must have a leading batch dim divisible by the mesh's data
    axis size. Uses the fused obj-prefilter decode+NMS serving graph when
    ``img_hw`` is given (the bench/export fast path), the plain decode+NMS
    path otherwise.
    """
    import jax.numpy as jnp

    from ayolov2_tpu.export.exporter import make_serving_fn

    dtype = image_dtype if image_dtype is not None else jnp.bfloat16
    core = make_serving_fn(
        model, None,
        conf_thres=conf_thres, iou_thres=iou_thres, top_k=top_k,
        keep_top_k=keep_top_k, nms_box=nms_box, include_nms=True,
        image_dtype=dtype, fused_decode=img_hw is not None, img_hw=img_hw,
    )
    rep = replicate(mesh)
    v_sharded = jax.device_put(variables, rep)
    sharded = jax.jit(
        core,
        in_shardings=(rep, batch_sharding(mesh, 4)),
        out_shardings=(batch_sharding(mesh, 3), batch_sharding(mesh, 1)),
    )

    def serve(images):
        n = mesh.shape["data"]
        assert images.shape[0] % n == 0, (
            f"batch {images.shape[0]} not divisible by data-axis size {n}"
        )
        return sharded(v_sharded, images)

    return serve
