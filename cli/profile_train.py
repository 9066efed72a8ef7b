"""Train-step stage breakdown + batch-size sweep + remat cost (on-chip).

The train-side analogue of STATUS.md's serve post-mortem (VERDICT r3 task
2): isolates, with the chained-iteration hard-sync methodology of bench.py,
the cost of each stage of the jitted train step
(scripts/train/yolo_trainer.py:289-358 hot loop):

  fwd         forward (training=True, BN stat update)
  loss        ComputeLoss incl. build_targets      (= fwd_loss - fwd)
  bwd         backward                             (= grad - fwd_loss)
  opt_ema     optimizer update + EMA               (= full - grad; also
              measured directly on fixed grads as a cross-check)

plus a batch-size sweep of the full step, the measured remat cost
(train.remat: jax.checkpoint at layer boundaries), an MFU estimate from the
compiled executable's own FLOP count when XLA exposes it, and a buffer-
donation probe (donation is config-gated off on the tunneled backend —
CLAUDE.md; on real hardware this row records the win instead).

Usage:
    python cli/profile_train.py [--bs-sweep 8 16 32 64] \
        [--out runs/bench_matrix/train_breakdown.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

SIZE = 640
MODEL_CFG = "res/configs/model/yolov5s.yaml"
# ~49 GFLOP/img fwd+bwd for yolov5s@640 (fwd ~16.4 GFLOP/img x3) — used
# only when the compiled executable doesn't expose its own FLOP count
FLOP_PER_IMG_FALLBACK = 49e9
V5E_BF16_PEAK = 197e12

HYP = {"optimizer_params": {"lr": 0.01}, "box": 0.05, "cls": 0.5, "obj": 1.0,
       "cls_pw": 1.0, "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
       "label_smoothing": 0.0, "weight_decay": 5e-4, "lrf": 0.1,
       "momentum": 0.937, "warmup_epochs": 3.0, "warmup_momentum": 0.8,
       "warmup_bias_lr": 0.1}


def _hard_time(fn, sync, iters=20):
    for _ in range(3):
        sync(fn())
    t0 = time.perf_counter()
    sync(fn())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(iters + 1):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0 - t1) / iters


def _make_batch(bs: int, nc: int, size: int = 0):
    size = size or SIZE
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, size, size, 3), dtype=np.uint8))
    targets = np.zeros((bs * 64, 6), np.float32)
    mask = np.zeros((bs * 64,), bool)
    for i in range(bs):
        targets[i] = [i, i % nc, 0.5, 0.5, 0.25, 0.25]
        mask[i] = True
    return images, jnp.asarray(targets), jnp.asarray(mask)


def main() -> int:
    global SIZE
    p = argparse.ArgumentParser(description="train step stage breakdown")
    p.add_argument("--batch-size", type=int, default=32, help="breakdown batch size")
    p.add_argument("--bs-sweep", type=int, nargs="*", default=[8, 16, 32, 64],
                   help="full-step batch sizes to sweep (empty to skip)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--img-size", type=int, default=SIZE,
                   help="lower for CPU smoke runs (e.g. 64)")
    p.add_argument("--skip-remat", action="store_true")
    p.add_argument("--skip-donate", action="store_true")
    p.add_argument("--skip-breakdown", action="store_true",
                   help="skip the stage-isolated fwd/loss/bwd/opt programs; "
                        "still measures the full step (the remat/donate baseline)")
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()
    SIZE = args.img_size

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ayolov2_tpu.loss import ComputeLoss
    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.train.optimizer import build_optimizer
    from ayolov2_tpu.train.train_state import EMA, create_train_state, make_train_step

    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def build(remat: bool = False):
        model = build_model(MODEL_CFG, dtype=jnp.bfloat16, remat=remat)
        variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE)
        loss_fn = ComputeLoss.from_hyp(model.head.stride_anchors(), model.nc, HYP)
        tx = build_optimizer(variables["params"], HYP, epochs=300,
                             steps_per_epoch=100, batch_size=args.batch_size)
        return model, variables, loss_fn, tx

    model, variables, loss_fn, tx = build()
    bs = args.batch_size
    images, targets, mask = _make_batch(bs, model.nc)
    state = create_train_state(variables, tx)

    # --- stage-isolated programs (each jitted alone; prefix-subtraction) ---
    def fwd_only(params, batch_stats, images):
        imgs = images.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        raw, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             imgs, training=True, mutable=["batch_stats"])
        return sum(jnp.sum(r.astype(jnp.float32)) for r in raw)

    def fwd_loss(params, batch_stats, images, targets, mask):
        imgs = images.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        raw, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             imgs, training=True, mutable=["batch_stats"])
        total, _ = loss_fn(raw, targets, mask)
        return total

    full_step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.bfloat16))

    sync_scalar = lambda r: float(r)
    sync_tree = lambda r: float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).sum())

    if not args.skip_breakdown:
        grad_fn = jax.jit(jax.grad(fwd_loss))
        fwd_j = jax.jit(fwd_only)
        fwd_loss_j = jax.jit(fwd_loss)
        t_fwd = _hard_time(lambda: fwd_j(state.params, state.batch_stats, images),
                           sync_scalar, args.iters)
        t_fwd_loss = _hard_time(
            lambda: fwd_loss_j(state.params, state.batch_stats, images, targets, mask),
            sync_scalar, args.iters)
        t_grad = _hard_time(
            lambda: grad_fn(state.params, state.batch_stats, images, targets, mask),
            sync_tree, args.iters)

    box = {"state": state}

    def run_full():
        box["state"], items = full_step(box["state"], images, targets, mask)
        return items

    t_full = _hard_time(run_full, lambda r: float(jnp.sum(r)), args.iters)

    if not args.skip_breakdown:
        # direct opt+EMA measurement on fixed grads (cross-check for full-grad)
        fixed_grads = jax.tree_util.tree_map(
            lambda x: jnp.full(x.shape, 1e-4, x.dtype), state.params)
        ema = EMA()

        @jax.jit
        def opt_ema(state):
            updates, new_opt = tx.update(fixed_grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            n = state.ema_updates + 1
            return state.replace(
                params=new_params, opt_state=new_opt,
                ema_params=ema.update(state.ema_params, new_params, n),
                ema_batch_stats=ema.update(state.ema_batch_stats, state.batch_stats, n),
                ema_updates=n, step=state.step + 1)

        sbox = {"s": state}

        def run_opt():
            sbox["s"] = opt_ema(sbox["s"])
            return sbox["s"].step

        t_opt_direct = _hard_time(run_opt, lambda r: float(r), args.iters)

        # compiled-executable FLOP count for an honest MFU when available
        flops = None
        try:
            ca = full_step.lower(state, images, targets, mask).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        step_flops = flops if flops else FLOP_PER_IMG_FALLBACK * bs
        emit(metric="train_stage_breakdown", batch_size=bs,
             fwd_ms=round(t_fwd * 1e3, 2),
             loss_ms=round((t_fwd_loss - t_fwd) * 1e3, 2),
             bwd_ms=round((t_grad - t_fwd_loss) * 1e3, 2),
             opt_ema_ms=round((t_full - t_grad) * 1e3, 2),
             opt_ema_direct_ms=round(t_opt_direct * 1e3, 2),
             full_ms=round(t_full * 1e3, 2),
             img_per_s=round(bs / t_full, 1),
             mfu_pct=round(100 * step_flops / t_full / V5E_BF16_PEAK, 1),
             flops_source="xla_cost_analysis" if flops else "analytic_49gf_per_img")
    else:
        emit(metric="train_step_full", batch_size=bs,
             ms_per_step=round(t_full * 1e3, 2), img_per_s=round(bs / t_full, 1),
             mfu_pct=round(100 * FLOP_PER_IMG_FALLBACK * bs / t_full / V5E_BF16_PEAK, 1))

    # --- batch-size sweep of the full step ---
    for b in args.bs_sweep:
        try:
            m2, v2, l2, tx2 = build()
            st2 = create_train_state(v2, tx2)
            step2 = jax.jit(make_train_step(m2, l2, tx2, image_dtype=jnp.bfloat16))
            im2, tg2, mk2 = _make_batch(b, m2.nc)
            b2 = {"s": st2}

            def run2():
                b2["s"], items = step2(b2["s"], im2, tg2, mk2)
                return items

            t = _hard_time(run2, lambda r: float(jnp.sum(r)), args.iters)
            emit(metric=f"train_step_bs{b}", batch_size=b,
                 ms_per_step=round(t * 1e3, 2), img_per_s=round(b / t, 1),
                 mfu_pct=round(100 * FLOP_PER_IMG_FALLBACK * b / t / V5E_BF16_PEAK, 1))
        except Exception as e:  # e.g. OOM at large bs — record, keep going
            emit(metric=f"train_step_bs{b}", batch_size=b, error=repr(e)[:200])

    # --- remat cost at the breakdown batch size ---
    # temp_size = XLA's compiled scratch (activations live here); the
    # memory lever each remat mode actually buys, from the executable itself
    def _temp_mb(step_fn, st):
        try:
            ma = step_fn.lower(st, images, targets, mask).compile().memory_analysis()
            return round(ma.temp_size_in_bytes / 1e6, 1) or None
        except Exception:
            return None

    if not args.skip_remat:
        base_temp = _temp_mb(full_step, state)
        for mode in (True, "save_convs"):
            mr, vr, lr, txr = build(remat=mode)
            str_ = create_train_state(vr, txr)
            stepr = jax.jit(make_train_step(mr, lr, txr, image_dtype=jnp.bfloat16))
            br = {"s": str_}

            def runr():
                br["s"], items = stepr(br["s"], images, targets, mask)
                return items

            t_remat = _hard_time(runr, lambda r: float(jnp.sum(r)), args.iters)
            emit(metric="train_step_remat", remat_mode=str(mode), batch_size=bs,
                 ms_per_step=round(t_remat * 1e3, 2),
                 baseline_ms=round(t_full * 1e3, 2),
                 overhead_pct=round(100 * (t_remat - t_full) / t_full, 1),
                 temp_mb=_temp_mb(stepr, br["s"]),
                 baseline_temp_mb=base_temp)

    # --- donation probe (expected InvalidArgument on the tunneled backend) ---
    if not args.skip_donate:
        try:
            stepd = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.bfloat16),
                            donate_argnums=(0,))
            # deep-copy every leaf: a fresh train state aliases params /
            # ema_params buffers and donating aliased buffers is an error
            # ("donate the same buffer twice") on every backend
            st = jax.tree_util.tree_map(jnp.array, create_train_state(variables, tx))
            st, _ = stepd(st, images, targets, mask)
            bd = {"s": st}

            def rund():
                bd["s"], items = stepd(bd["s"], images, targets, mask)
                return items

            t_don = _hard_time(rund, lambda r: float(jnp.sum(r)), args.iters)
            emit(metric="train_step_donated", batch_size=bs,
                 ms_per_step=round(t_don * 1e3, 2),
                 baseline_ms=round(t_full * 1e3, 2),
                 delta_pct=round(100 * (t_don - t_full) / t_full, 1))
        except Exception as e:
            emit(metric="train_step_donated", batch_size=bs,
                 error=repr(e)[:200],
                 note="donation unsupported on this backend (config-gated off; "
                      "enable train.donate_state on real hardware)")

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({"device": jax.devices()[0].platform,
                                   "img_size": SIZE, "rows": rows}, indent=1))
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
