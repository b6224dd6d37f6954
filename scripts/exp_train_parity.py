#!/usr/bin/env python
"""Converged-Dice training parity + quality-knob ablation (VERDICT r3 items
1c/4/8).

Two modes, both on the same deterministic synthetic blob task (the oracle
tests' generator — images correlated with circular masks):

  parity  — train the REFERENCE trainer in-process (tf_keras,
            ``train_adipose_unet_v3.py``: real ``AdiposeUNetV3`` graph at
            256², compiled Adam lr + OHEM-0.7, ``train_on_batch`` loop —
            the ``run_complete_pipeline.sh:340-451`` workflow's training
            core) and the REBUILD (same seeded He init, same batches,
            dropout 0 both sides), and compare per-epoch and FINAL val Dice.
            North-star claim: converged val Dice within 0.5 %.

  ablate  — rebuild-only ablation of the quality knobs the reference claims
            but never measured (``train_adipose_unet_v3.py:381,505``): EMA
            (decay 0.995, eval with EMA params), cosine schedule, deep
            supervision — each vs the plain baseline, same data/seed.

  batch-sweep — rebuild-only large-batch quality validation (VERDICT r4 #1):
            b2 at the reference schedule (control) vs b8 with linearly- and
            sqrt-scaled LR, equal sample budget, converged val Dice compared.
            Decides whether the b8 train-throughput headline is a legitimate
            operating point (``train_adipose_unet_v3.py:1471-1487``).

  ablate-horizon — the quality-knob ablation at the reference's PRODUCTION
            schedule length (VERDICT r4 #4; default 150 epochs via
            ADIPOSE_ABLATE_EPOCHS): EMA-0.995 and cosine measured at the
            horizon their claims assume (``train_adipose_unet_v3.py:381,505``).
            Writes separate ``ablate_horizon_*`` keys so the short-horizon
            ablation rows are preserved.

Writes scripts/train_parity_results.json and prints a summary. CPU-forced
(runs the reference under TF); ~10–20 min in parity mode on the 1-CPU env.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# parity mode must run the reference under TF on the same host → CPU. The
# rebuild-only modes (ablate / ema-matched / batch-sweep) may use the real
# chip via ADIPOSE_ABLATE_TPU=1 (serialize with other TPU scripts) — the
# 256² nb=4 task is tiny, so each config is a few compiles + seconds of
# device time. Modes that run the TF reference refuse the TPU override
# outright: a TPU-backed jax next to the TF oracle breaks the script's
# CPU-parity requirement AND the one-TPU serialization rule.
_REBUILD_ONLY_MODES = ("ablate", "ema-matched", "batch-sweep",
                       "ablate-horizon")
_mode_arg = next((a for a in sys.argv[1:] if not a.startswith("-")), "")
if os.environ.get("ADIPOSE_ABLATE_TPU", "0") == "1":
    if _mode_arg not in _REBUILD_ONLY_MODES:
        sys.exit("ADIPOSE_ABLATE_TPU=1 is only valid for rebuild-only modes "
                 f"{_REBUILD_ONLY_MODES}; mode {_mode_arg!r} runs the TF "
                 "reference and must stay on CPU")
else:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ADIPOSE_ABLATE_SIZE/EPOCHS shrink the ablation when wall-clock is tight
# (e.g. 128/15 on the 1-CPU env with the TPU tunnel down); parity mode
# always publishes at the defaults.
SIZE = int(os.environ.get("ADIPOSE_ABLATE_SIZE", "256"))
NB, BATCH = 4, 4
LR = 2e-4          # production compiles 1e-4 (:1471); 2e-4 converges the
                   # tiny synthetic task in a CPU-feasible step budget —
                   # both frameworks use the same value, so parity holds
N_TRAIN, N_VAL = 64, 16
# ablate-horizon exists to measure at the reference's production schedule
# length, so it defaults to 150 epochs; every other mode defaults to 30
EPOCHS = int(os.environ.get(
    "ADIPOSE_ABLATE_EPOCHS", "150" if _mode_arg == "ablate-horizon" else "30"))


def synth_dataset(n, seed):
    """Blob masks; images = 0.3·noise + 2·mask − 1 (oracle tests' law)."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    xs, ys = [], []
    for _ in range(n):
        cx, cy = rs.randint(40, SIZE - 40), rs.randint(40, SIZE - 40)
        r = rs.randint(20, 60)
        m = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r).astype(np.float32)
        x = rs.standard_normal((SIZE, SIZE)).astype(np.float32)
        xs.append((x * 0.3 + m * 2.0 - 1.0).astype(np.float32))
        ys.append(m)
    return np.stack(xs), np.stack(ys)


def epoch_batches(n, epoch, seed=865, batch=None):
    batch = BATCH if batch is None else batch
    order = np.random.RandomState(seed + epoch).permutation(n)
    for i in range(0, n - batch + 1, batch):
        yield order[i : i + batch]


def dice_of(pred, y, thr=0.5):
    p = (pred > thr).astype(np.float32)
    inter = (p * y).sum()
    return float((2 * inter + 1e-7) / (p.sum() + y.sum() + 1e-7))


def val_dice_curvepoint(predict, xv, yv):
    preds = [np.asarray(predict(xv[i : i + BATCH])) for i in range(0, len(xv), BATCH)]
    return dice_of(np.concatenate(preds), yv)


# ---------------------------------------------------------------- reference
def run_reference(xt, yt, xv, yv):
    from tf_oracle_util import (
        build_ref_unet_at_size,
        fill_keras_unet,
        load_reference_unet_module,
        seeded_unet_weights,
    )

    mod = load_reference_unet_module()
    import tempfile

    trainer, net = build_ref_unet_at_size(
        mod, tempfile.mkdtemp(), SIZE, NB, dropout_rate=0.0)
    trainer.unfreeze_encoder()
    fill_keras_unet(net, seeded_unet_weights(NB, ds=False))
    trainer.compile_model(lr=LR, use_hard_mining=True, hard_example_ratio=0.7)

    curve = []
    t0 = time.time()
    for epoch in range(EPOCHS):
        for idx in epoch_batches(len(xt), epoch):
            net.train_on_batch(xt[idx], yt[idx])
        curve.append(val_dice_curvepoint(
            lambda xb: net(xb, training=False), xv, yv))
        print(f"[ref] epoch {epoch}: val_dice={curve[-1]:.4f}", flush=True)
    return {"curve": curve, "final": curve[-1], "best": max(curve),
            "train_s": time.time() - t0}


# ------------------------------------------------------------------ rebuild
def make_rebuild(ds=False):
    from tf_oracle_util import fill_flax_unet, seeded_unet_weights

    from adipose_tpu.models.unet import DilatedUNet

    model = DilatedUNet(init_nb=NB, compute_dtype=jnp.float32,
                        dropout_rate=0.0, use_deep_supervision=ds)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
    variables = fill_flax_unet(variables, seeded_unet_weights(NB, ds=ds))
    return model, variables


def run_rebuild(xt, yt, xv, yv, ds=False, use_ema=False, cosine=False,
                label="", ema_decay=0.995, batch=None, lr=None):
    from functools import partial

    from adipose_tpu.ops import losses as L
    from adipose_tpu.train.ema import EmaTracker
    from adipose_tpu.train.schedules import cosine_with_warmup
    from adipose_tpu.train.state import (
        TrainState,
        make_optimizer,
        make_unet_predict,
        make_unet_train_step,
        set_learning_rate,
    )

    batch = BATCH if batch is None else batch
    lr_eff = LR if lr is None else lr
    model, variables = make_rebuild(ds)
    main = partial(L.ohem_loss, keep_ratio=0.7)
    if ds:
        def loss_fn(yt_, out):
            return L.deep_supervision_loss(
                yt_, out, main, L.combined_loss_standard, 1.0, 0.4, 0.3)
    else:
        loss_fn = main
    tx = make_optimizer("adam", lr=lr_eff)
    state = TrainState.create({"params": variables["params"]}, tx)
    step = make_unet_train_step(model, loss_fn)
    predict = make_unet_predict(model)
    sched = cosine_with_warmup(max_lr=lr_eff, min_lr=lr_eff * 0.01,
                               warmup_epochs=2, total_epochs=EPOCHS)
    ema = EmaTracker(decay=ema_decay) if use_ema else None

    curve, curve_ema = [], []
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    for epoch in range(EPOCHS):
        if cosine:
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, sched(epoch)))
        for idx in epoch_batches(len(xt), epoch, batch=batch):
            state, _ = step(state, jnp.asarray(xt[idx]), jnp.asarray(yt[idx]),
                            key)
        if ema is not None:
            # reference EMACallback updates per EPOCH (:431-443)
            ema.update(state.params)
        curve.append(val_dice_curvepoint(
            lambda xb: predict(state.params, jnp.asarray(xb)), xv, yv))
        if ema is not None:
            curve_ema.append(val_dice_curvepoint(
                lambda xb: predict(ema.ema_params, jnp.asarray(xb)), xv, yv))
        print(f"[{label}] epoch {epoch}: val_dice={curve[-1]:.4f}"
              + (f" ema={curve_ema[-1]:.4f}" if ema is not None else ""),
              flush=True)
    out = {"curve": curve, "final": curve[-1], "best": max(curve),
           "train_s": time.time() - t0}
    if ema is not None:
        out["curve_ema"] = curve_ema
        out["final_ema"] = curve_ema[-1]
        out["best_ema"] = max(curve_ema)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode",
                    choices=["parity", "ablate", "both", "ema-matched",
                             "batch-sweep", "ablate-horizon"])
    args = ap.parse_args()

    xt, yt = synth_dataset(N_TRAIN, seed=100)
    xv, yv = synth_dataset(N_VAL, seed=200)
    cfg = {"size": SIZE, "init_nb": NB, "batch": BATCH, "lr": LR,
           "epochs": EPOCHS, "n_train": N_TRAIN, "n_val": N_VAL}
    # modes honoring ADIPOSE_ABLATE_SIZE/EPOCHS may run at a reduced scale —
    # only parity-bearing modes may write the parity 'config' key on merge
    # (ADVICE r4: an ema-matched run once clobbered it)
    if args.mode in ("parity", "both"):
        results = {"config": cfg}
    elif args.mode in ("batch-sweep", "ablate-horizon"):
        results = {}  # these embed their config in their own section
    else:
        results = {"ablate_config": cfg}

    if args.mode in ("parity", "both"):
        results["reference"] = run_reference(xt, yt, xv, yv)
        results["rebuild"] = run_rebuild(xt, yt, xv, yv, label="rebuild")
        gap = abs(results["reference"]["final"] - results["rebuild"]["final"])
        results["final_dice_gap"] = gap
        print(f"\nPARITY: ref final={results['reference']['final']:.4f} "
              f"rebuild final={results['rebuild']['final']:.4f} "
              f"gap={gap:.4f} ({gap * 100:.2f}% — north-star ≤0.5%)")

    if args.mode == "ema-matched":
        # isolate the EMA MECHANISM from the horizon: pick a per-epoch decay
        # whose retention over EPOCHS matches the reference's 0.995 over its
        # ~220-epoch production schedule (0.995^220 ≈ 0.33 → d = 0.33^(1/E))
        d = float(0.995 ** 220) ** (1.0 / EPOCHS)
        results["ablate_ema_matched"] = run_rebuild(
            xt, yt, xv, yv, use_ema=True, ema_decay=d,
            label=f"ema_matched(d={d:.3f})")
        r = results["ablate_ema_matched"]
        results["ablate_ema_matched"]["decay"] = d
        print(f"\nEMA horizon-matched (decay {d:.3f}): "
              f"final={r['final']:.4f} ema={r['final_ema']:.4f}")

    if args.mode == "batch-sweep":
        # VERDICT r4 #1: does the rebuild's efficient batch (8) reach the
        # reference schedule's converged quality? Equal SAMPLE budget (same
        # epochs over the same data), LR scaled linearly and by sqrt for the
        # 4× batch growth; b2 at the base LR is the reference-schedule
        # control (b2-vs-b2 framework parity is already pinned at 0.04% by
        # parity mode, so rebuild-b2 stands in for the TF reference here).
        sweep = {"config": cfg}
        for label, b, lr in (("b2_control", 2, LR),
                             ("b8_linear", 8, LR * 4.0),
                             ("b8_sqrt", 8, LR * 2.0)):
            r = run_rebuild(xt, yt, xv, yv, label=label, batch=b, lr=lr)
            r["batch"], r["lr"] = b, lr
            sweep[label] = r
        ctrl = sweep["b2_control"]
        print("\nBATCH SWEEP (converged val Dice, equal sample budget):")
        for label in ("b2_control", "b8_linear", "b8_sqrt"):
            r = sweep[label]
            gap = r["final"] - ctrl["final"]
            print(f"  {label:12s} b={r['batch']} lr={r['lr']:.1e} "
                  f"final={r['final']:.4f} best={r['best']:.4f} "
                  f"gap_vs_b2={gap * 100:+.2f}%")
        results["batch_sweep"] = sweep

    if args.mode == "ablate-horizon":
        # same knob matrix as 'ablate' but at the production schedule length
        # (set EPOCHS via ADIPOSE_ABLATE_EPOCHS, default 30 → pass 150);
        # separate keys so the short-horizon rows survive the merge.
        horizon = {"config": cfg}
        horizon["baseline"] = run_rebuild(xt, yt, xv, yv, label="hz_baseline")
        horizon["ema"] = run_rebuild(xt, yt, xv, yv, use_ema=True,
                                     label="hz_ema")
        horizon["cosine"] = run_rebuild(xt, yt, xv, yv, cosine=True,
                                        label="hz_cosine")
        b = horizon["baseline"]["best"]
        print(f"\nHORIZON ABLATION ({EPOCHS} epochs, best val Dice):")
        print(f"  baseline   {b:.4f}")
        print(f"  + EMA eval {horizon['ema'].get('best_ema'):.4f}")
        print(f"  + cosine   {horizon['cosine']['best']:.4f}")
        results["ablate_horizon"] = horizon

    if args.mode in ("ablate", "both"):
        results["ablate_baseline"] = run_rebuild(xt, yt, xv, yv,
                                                 label="baseline")
        results["ablate_ema"] = run_rebuild(xt, yt, xv, yv, use_ema=True,
                                            label="ema")
        results["ablate_cosine"] = run_rebuild(xt, yt, xv, yv, cosine=True,
                                               label="cosine")
        results["ablate_ds"] = run_rebuild(xt, yt, xv, yv, ds=True,
                                           label="deep_supervision")
        b = results["ablate_baseline"]["best"]
        print("\nABLATION (best val Dice):")
        print(f"  baseline          {b:.4f}")
        print(f"  + EMA eval        {results['ablate_ema'].get('best_ema'):.4f}")
        print(f"  + cosine          {results['ablate_cosine']['best']:.4f}")
        print(f"  + deep supervision {results['ablate_ds']['best']:.4f}")

    out = os.path.join(os.path.dirname(__file__), "train_parity_results.json")
    if os.path.exists(out):  # merge: parity and ablate may run separately
        with open(out) as f:
            prev = json.load(f)
        prev.update(results)
        results = prev
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
