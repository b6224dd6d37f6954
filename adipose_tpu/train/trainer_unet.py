"""Two-phase U-Net fine-tuning driver.

Behavioral spec: ``train_model`` (``train_adipose_unet_v3.py:1072-1443``):
  phase 1 — frozen encoder, lr 1e-4, EMA decay 0.999 (not saved), best-by-val-
            dice checkpoint, early stopping (patience 15), cosine+warmup or
            ReduceLROnPlateau;
  phase 2 — all layers from phase-1 best, lr 1e-5, EMA decay 0.995 with
            best-snapshot saving, same callbacks; final best-overall = phase-2
            best. Artifacts per :mod:`adipose_tpu.train.checkpoint`.

TPU-native: one jitted train step per phase (augment → normalize → fwd/bwd →
update fused on device); batches shard over the mesh 'data' axis, so the same
driver trains on 1 chip or a v5e-8. Normalization happens on device from the
precomputed dataset stats. The host loop only orchestrates epochs/callbacks.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.core.config import TrainConfig, UNetConfig
from adipose_tpu.core.jitopts import infer_jit, train_jit
from adipose_tpu.core.seeding import key_for, keys_for_batch_range
from adipose_tpu.data.augment import augment_batch, batched_tier
from adipose_tpu.data.loader import TileDataset, prefetch_batches
from adipose_tpu.data.stats import compute_mean_std, dataset_image_paths
from adipose_tpu.models.unet import DilatedUNet, encoder_param_mask
from adipose_tpu.ops.normalize import batched_percentile_unit_fast
from adipose_tpu.parallel.mesh import (
    make_mesh_for_batch,
    make_mesh_spatial,
    replicate,
    shard_batch,
    shard_batch_spatial,
)
from adipose_tpu.train import checkpoint as ckpt
from adipose_tpu.train.ema import EmaTracker
from adipose_tpu.train.schedules import EarlyStopping, ReduceLROnPlateau, cosine_with_warmup
from adipose_tpu.train.state import (
    TrainState,
    make_optimizer,
    make_unet_eval_step,
    set_learning_rate,
    unet_loss_from_config,
)
from adipose_tpu.ops import losses as L


def make_augment_step(tier: str, mesh=None):
    """Device-side batch augmentation as its OWN jit program.

    Measured on v5e: fusing augmentation into the training program slows the
    whole step 3.6× (4.3 vs 15.6 tiles/s at 1024² — the warp intermediates
    inflate the train program's live set and wreck XLA's scheduling). Two
    programs are the fast shape. The batch goes through
    :func:`adipose_tpu.data.augment.batched_tier` (batch-level D4 stage) —
    the earlier ``vmap(TIERS[tier])`` form made XLA pick a 16×-padded
    batch-minor layout for the whole program (measured 916 ms/batch at b8
    'moderate' with forced-download timing; the batched-D4 form is the fix).
    """

    @partial(jax.jit, static_argnames=())
    def augment_step(key, images_u8, masks_u8):
        images = images_u8.astype(jnp.float32)
        masks = masks_u8.astype(jnp.float32)
        return batched_tier(key, images, masks, tier, mesh=mesh)

    return augment_step


def _make_fused_train_step(model, loss_fn, tier: str, norm_method: str,
                           p_low: float, p_high: float, mesh=None):
    """Normalize + train in one jitted program (augment runs as a separate
    device program first — see :func:`make_augment_step`)."""

    @partial(train_jit, donate_argnums=(0,), static_argnames=("augment",))
    def step(state: TrainState, images_u8, masks_u8, rng, mean, std, augment=False):
        images = images_u8.astype(jnp.float32)
        masks = masks_u8.astype(jnp.float32)
        if augment:  # legacy single-program path (slower; kept for dryrun)
            aug_key, drop_key = jax.random.split(rng)
            images, masks = batched_tier(aug_key, images, masks, tier,
                                          mesh=mesh)
        else:
            drop_key = rng
        if norm_method == "zscore":
            images = (images - mean) / (std + 1e-10)
        else:  # per-tile percentile (TileDataset :589-592); u8-CDF kernel on TPU
            images = batched_percentile_unit_fast(images, p_low, p_high, mesh=mesh)

        def compute(params):
            out = model.apply(params, images, train=True, rngs={"dropout": drop_key})
            loss = loss_fn(masks, out)
            main = out["main_out"] if isinstance(out, dict) else out
            return loss, main

        (loss, main), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "dice_coef": L.dice_coef(masks, main)}

    return step


def _looks_like_compile_oom(err: BaseException) -> bool:
    """Heuristic: did the train step fail in compilation for memory reasons?

    v5e measurement (scripts/exp_train_step_bench.py): the b4 1024² step hits
    an XLA conv lowering that allocates 20.8 G of HLO temps and fails to
    compile, while b2 and b8 compile fine. Error surfaces differ by runtime:
    plain TPU raises RESOURCE_EXHAUSTED / 'Ran out of memory'; the tunneled
    remote compiler wraps it in an INTERNAL remote_compile HTTP error.
    """
    msg = str(err)
    return any(s in msg for s in (
        "RESOURCE_EXHAUSTED", "Ran out of memory", "out of memory",
        "remote_compile", "hbm", "vmem",
    ))


def _make_val_step(model, loss_fn, norm_method: str, p_low: float,
                   p_high: float, mesh=None):
    @infer_jit
    def step(params, images_u8, masks_u8, mean, std):
        images = images_u8.astype(jnp.float32)
        masks = masks_u8.astype(jnp.float32)
        if norm_method == "zscore":
            images = (images - mean) / (std + 1e-10)
        else:
            images = batched_percentile_unit_fast(images, p_low, p_high, mesh=mesh)
        out = model.apply(params, images, train=False)
        main = out["main_out"] if isinstance(out, dict) else out
        from adipose_tpu.ops.metrics import activation_stats

        return {"loss": loss_fn(masks, out), "dice_coef": L.dice_coef(masks, main),
                **activation_stats(main)}

    return step


class UNetTrainer:
    def __init__(
        self,
        data_root: str | Path,
        cfg: TrainConfig | None = None,
        model_cfg: UNetConfig | None = None,
        checkpoint_name: str = "adipose_sybreosin",
        build_timestamp: str | None = None,
        checkpoint_root: str | Path = "checkpoints/segmentation",
        auto_resume: bool = False,
    ):
        self.auto_resume = auto_resume
        self.cfg = cfg or TrainConfig()
        self.model_cfg = model_cfg or UNetConfig()
        self.data_root = Path(data_root)
        if self.cfg.shard_spatial:
            self.mesh = make_mesh_spatial(
                self.cfg.batch_size, self.cfg.num_devices,
                self.model_cfg.tile_size,
            )
            self._shard = shard_batch_spatial
        else:
            self.mesh = make_mesh_for_batch(self.cfg.batch_size, self.cfg.num_devices)
            self._shard = shard_batch
        self.ckpt_dir = ckpt.checkpoint_dir_for(
            checkpoint_name, build_timestamp, checkpoint_root
        )
        self.model = DilatedUNet(
            init_nb=self.model_cfg.init_nb,
            dropout_rate=self.model_cfg.dropout_rate,
            use_deep_supervision=self.model_cfg.use_deep_supervision,
            dilation_rates=tuple(self.model_cfg.dilation_rates),
            compute_dtype=jnp.bfloat16
            if self.model_cfg.compute_dtype == "bfloat16"
            else jnp.float32,
            remat=self.model_cfg.remat,
            remat_level1=self.model_cfg.remat_level1,
            lane_pad=self.model_cfg.lane_pad,
            fast_head=self.model_cfg.fast_head,
        )
        self.loss_fn = unet_loss_from_config(self.cfg)
        self.history: list = []

        ds = self.data_root / "dataset"
        self.train_data = TileDataset(
            ds / "train" / "images", ds / "train" / "masks",
            self.cfg.batch_size, seed=self.cfg.seed,
            cache_limit_mb=self.cfg.cache_limit_mb,
        )
        self.val_data = TileDataset(
            ds / "val" / "images", ds / "val" / "masks",
            self.cfg.batch_size, seed=self.cfg.seed,
            cache_limit_mb=self.cfg.cache_limit_mb,
        )
        if not len(self.train_data):
            raise FileNotFoundError(f"no training tiles under {ds}")
        if not len(self.val_data):
            # fail HERE, not at the end of the first epoch's (minutes-long)
            # training pass when val_metrics[0] would IndexError
            raise FileNotFoundError(f"no validation tiles under {ds}")

        # Global train stats → normalization_stats.json (:1194-1207)
        self.mean, self.std = compute_mean_std(
            dataset_image_paths(ds / "train" / "images")
        )
        ckpt.save_normalization_stats(
            self.ckpt_dir, self.mean, self.std, self.cfg.normalization_method
        )

    # -- phases ---------------------------------------------------------------

    def init_params(self, tile_size: int | None = None):
        size = tile_size or self.model_cfg.tile_size
        sample = jnp.zeros((1, size, size))
        params = self.model.init(key_for("unet.init", self.cfg.seed), sample)
        return replicate(self.mesh, params)

    def _run_phase(
        self,
        phase: int,
        params,
        epochs: int,
        lr: float,
        min_lr: float,
        ema_decay: float,
        freeze_encoder: bool,
        save_ema: bool,
        augment_tier: str,
    ):
        cfg = self.cfg
        mask = (
            encoder_param_mask(params["params"]) if freeze_encoder else None
        )
        tx = make_optimizer(
            cfg.optimizer, lr, cfg.weight_decay,
            {"params": mask} if mask is not None else None,
        )
        state = TrainState.create(params, tx)

        def build_steps():
            # the train/val/augment programs depend only on (model flags,
            # augment tier) — both phases normally share them, so reuse the
            # phase-1 jit wrappers rather than paying the phase-2 boundary
            # 1-5 min remote recompiles of identical programs. The retry
            # ladder's clone(remat=...) changes the key, so it builds fresh.
            key = (augment_tier, self.model.remat, self.model.remat_level1)
            cache = self.__dict__.setdefault("_step_cache", {})
            if key not in cache:
                cache[key] = (
                    _make_fused_train_step(
                        self.model, self.loss_fn, augment_tier,
                        cfg.normalization_method, cfg.percentile_low,
                        cfg.percentile_high, mesh=self.mesh,
                    ),
                    _make_val_step(
                        self.model, self.loss_fn, cfg.normalization_method,
                        cfg.percentile_low, cfg.percentile_high, mesh=self.mesh,
                    ),
                    make_augment_step(augment_tier, mesh=self.mesh),
                )
            return cache[key][:2]

        train_step, val_step = build_steps()
        augment_step = self._step_cache[
            (augment_tier, self.model.remat, self.model.remat_level1)][2]
        warmup = cfg.warmup_epochs if phase == 1 else cfg.warmup_epochs_phase2
        schedule = (
            cosine_with_warmup(lr, min_lr, warmup, epochs)
            if cfg.use_cosine_schedule
            else None
        )
        plateau = None if schedule else ReduceLROnPlateau(lr=lr, min_lr=min_lr)
        stopper = EarlyStopping(patience=cfg.early_stopping_patience)
        ema = EmaTracker(decay=ema_decay) if cfg.use_ema else None

        mean = jnp.float32(self.mean)
        std = jnp.float32(self.std)
        best_dice = -np.inf
        # host-owned snapshot: state.params is donated by the first train step,
        # so an epochs=0 phase (or one that never improves) must not return the
        # live (soon-deleted) buffers
        best_params = jax.device_get(state.params)

        # Preemption recovery: resume mid-phase from the rolling 'latest'
        # checkpoint (orbax params + progress metadata). The reference has no
        # preemption story (SURVEY.md §5 failure detection). Restored: params,
        # the phase-best snapshot (so a post-resume plateau still emits the
        # true best as weights_best_overall), plateau LR, and early-stop
        # counters. Adam moments restart fresh — noted in the resume line.
        start_epoch = 0
        latest_meta = self.ckpt_dir / "latest_state.json"
        if self.auto_resume and latest_meta.exists():
            import json as _json

            meta = _json.loads(latest_meta.read_text())
            if meta.get("phase") == phase and (self.ckpt_dir / "latest").exists():
                restored = ckpt.load_params(self.ckpt_dir / "latest")
                state = state.replace(params=jax.tree.map(jnp.asarray, restored))
                start_epoch = int(meta["epoch"]) + 1
                best_dice = float(meta.get("best_dice", -np.inf))
                best_path = self.ckpt_dir / f"phase{phase}_best"
                if best_dice > -np.inf:
                    if best_path.exists():
                        best_params = ckpt.load_params(best_path)
                    else:
                        # the metadata promises a best snapshot that isn't on
                        # disk (deleted / torn write at preemption) — keeping
                        # best_dice would let the phase return FRESH-INIT
                        # params labeled with the recorded dice
                        print("[resume] WARNING: recorded best_dice "
                              f"{best_dice:.4f} but {best_path.name} is "
                              "missing — resetting best to -inf")
                        best_dice = -np.inf
                if plateau is not None and "plateau_lr" in meta:
                    plateau.lr = float(meta["plateau_lr"])
                    if meta.get("plateau_best") is not None:
                        plateau.best = float(meta["plateau_best"])
                        plateau.wait = int(meta.get("plateau_wait", 0))
                    state = state.replace(
                        opt_state=set_learning_rate(state.opt_state, plateau.lr))
                if "stopper_best" in meta and meta["stopper_best"] is not None:
                    stopper.best = float(meta["stopper_best"])
                    stopper.best_epoch = int(meta.get("stopper_best_epoch", -1))
                    stopper.wait = int(meta.get("stopper_wait", 0))
                if ema is not None and (self.ckpt_dir / "latest_ema").exists():
                    ema.ema_params = jax.tree.map(
                        jnp.asarray, ckpt.load_params(self.ckpt_dir / "latest_ema"))
                    if meta.get("ema_best_metric") is not None:
                        ema.best_metric = float(meta["ema_best_metric"])
                print(f"[resume] phase {phase} from epoch {start_epoch} "
                      f"(best dice {best_dice:.4f}; optimizer moments fresh)")

        logger = ckpt.CsvLogger(self.ckpt_dir / f"phase{phase}_training.log",
                                append=start_epoch > 0)

        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            if schedule:
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, schedule(epoch))
                )
            train_metrics = []

            def run_step(state, imgs, masks, step_key):
                nonlocal train_step, val_step
                try:
                    return train_step(state, imgs, masks, step_key, mean, std)
                except Exception as err:  # pragma: no cover - TPU-dependent
                    # Some batch sizes hit an XLA conv lowering whose HLO
                    # temps exceed HBM (b4 at 1024² on v5e: 20.8 G — see
                    # _looks_like_compile_oom). The retry ladder:
                    #   1. same step again — a transient remote-compile/HTTP
                    #      failure (indistinguishable from OOM through the
                    #      tunnel) should not permanently flip remat on;
                    #   2. rebuild with remat_level1=True (same param tree,
                    #      bit-identical forward/grads — tested): removes
                    #      only the 1024²-scale stashes, ~5 level-1 convs of
                    #      recompute instead of full-model replay;
                    #   3. rebuild with remat=True (every stage): makes b4
                    #      compile and run at 8.1 tiles/s (~30% recompute).
                    # The step donates its state; a COMPILE failure leaves
                    # the buffers intact, but if this failure came from
                    # execution the donated state is gone and retrying would
                    # mask the real error — check before retrying.
                    def donated():
                        return any(
                            getattr(leaf, "is_deleted", lambda: False)()
                            for leaf in jax.tree_util.tree_leaves(state.params)
                        )

                    if (donated() or self.model.remat
                            or not _looks_like_compile_oom(err)):
                        raise
                    try:
                        print(f"[train] step failed ({type(err).__name__}); "
                              "retrying once (transient?)")
                        return train_step(state, imgs, masks, step_key,
                                          mean, std)
                    except Exception as err2:
                        # a rung that fails during EXECUTION consumed the
                        # donated state — surface ITS error rather than
                        # dispatching deleted buffers at the next rung
                        if donated():
                            raise err2
                    if not self.model.remat_level1:
                        try:
                            print("[train] step failed again; rebuilding "
                                  "with remat_level1=True")
                            self.model = self.model.clone(remat_level1=True)
                            train_step, val_step = build_steps()
                            return train_step(state, imgs, masks, step_key,
                                              mean, std)
                        except Exception as err3:
                            if donated():
                                raise err3
                    print("[train] level-1 remat insufficient; rebuilding "
                          "with remat=True")
                    self.model = self.model.clone(remat=True)
                    train_step, val_step = build_steps()
                    return train_step(state, imgs, masks, step_key,
                                      mean, std)

            # background decode of the next batches overlaps the device step
            # (the reference's tf.data prefetch, train_adipose_unet_v3.py:623).
            # 1-deep software pipeline on top: batch k+1's augmentation is
            # dispatched BEFORE batch k's train step is consumed — measured
            # +11% (668.8 vs 743.3 ms/step b8 incl. aug,
            # scripts/bench_unet_train_pipeline.py), and it sidesteps the
            # runtime's intermittent multi-second stall when a program's
            # output feeds the immediately-next dispatch (BASELINE.md r3
            # axon lessons).
            # whole-epoch key schedule in ONE device program: pairs[b] is
            # exactly split(key_for(f"train.p{phase}", seed, epoch*100003+b)),
            # replacing the two ~100 ms per-batch dispatches the axon tunnel
            # charges for key_for + split (BASELINE.md r3 lessons; the
            # classifier epoch loop already works this way)
            pairs = keys_for_batch_range(
                f"train.p{phase}", cfg.seed,
                epoch * 100003 + np.arange(self.train_data.steps_per_epoch))
            pending = None
            for b, (imgs, masks) in enumerate(
                    prefetch_batches(self.train_data.epoch_batches(epoch))):
                aug_key, step_key = jnp.asarray(pairs[b, 0]), jnp.asarray(pairs[b, 1])
                imgs, masks = self._shard(self.mesh, (imgs, masks))
                aug_imgs, aug_masks = augment_step(aug_key, imgs, masks)
                if pending is not None:
                    state, m = run_step(state, *pending)
                    train_metrics.append(m)
                pending = (aug_imgs, aug_masks, step_key)
            if pending is not None:
                state, m = run_step(state, *pending)
                train_metrics.append(m)
            val_metrics = []
            for imgs, masks in prefetch_batches(
                    self.val_data.epoch_batches(epoch, shuffle=False)):
                imgs, masks = self._shard(self.mesh, (imgs, masks))
                val_metrics.append(val_step(state.params, imgs, masks, mean, std))

            tm = {k: float(np.mean([float(x[k]) for x in train_metrics])) for k in train_metrics[0]}
            vm = {f"val_{k}": float(np.mean([float(x[k]) for x in val_metrics])) for k in val_metrics[0]}
            row = {**tm, **vm, "lr": schedule(epoch) if schedule else plateau.lr,
                   "epoch_time_s": time.time() - t0}
            logger.log(epoch, row)
            self.history.append({"phase": phase, "epoch": epoch, **row})

            val_dice = vm["val_dice_coef"]
            if ema is not None:
                ema.update(state.params, metric=val_dice if save_ema else None)
            if val_dice > best_dice:
                best_dice = val_dice
                # device_get: the live state's buffers are donated by the next
                # train step, so the snapshot must own host copies
                best_params = jax.device_get(state.params)
                ckpt.save_params(self.ckpt_dir, f"phase{phase}_best", best_params)
            if plateau is not None:
                new_lr = plateau.update(val_dice)
                state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))
            if self.auto_resume:
                import json as _json

                ckpt.save_params(self.ckpt_dir, "latest", jax.device_get(state.params))
                if ema is not None and ema.ema_params is not None:
                    ckpt.save_params(self.ckpt_dir, "latest_ema",
                                     jax.device_get(ema.ema_params))
                (self.ckpt_dir / "latest_state.json").write_text(_json.dumps({
                    "phase": phase, "epoch": epoch, "best_dice": float(best_dice),
                    "plateau_lr": plateau.lr if plateau is not None else None,
                    "plateau_best": plateau.best if plateau is not None else None,
                    "plateau_wait": plateau.wait if plateau is not None else 0,
                    "ema_best_metric": ema.best_metric if ema is not None else None,
                    "stopper_best": stopper.best,
                    "stopper_best_epoch": stopper.best_epoch,
                    "stopper_wait": stopper.wait,
                }))
            if stopper.update(val_dice, epoch):
                break

        if ema is not None and save_ema and ema.snapshot is not None:
            ckpt.save_params(self.ckpt_dir, "weights_ema", jax.device_get(ema.snapshot))
        return best_params, best_dice

    def load_pretrained(self, params, path: str | Path):
        """Smart by-name weight transfer with mismatch skipping — the
        reference's v2-compatible loader (``train_adipose_unet_v3.py:881-916``):
        aux-head / shape-mismatched entries keep their fresh init. Accepts a
        TF ``.h5``/``.weights.h5`` (via the importer) or an orbax checkpoint."""
        p = Path(path)
        if p.suffix == ".h5" or p.name.endswith(".weights.h5"):
            from adipose_tpu.models.tf_import import import_unet_weights

            try:
                return import_unet_weights(p, params)
            except ValueError as e:
                print(f"[pretrained] TF import fell back to by-name merge: {e}")
                return params
        loaded = ckpt.load_params(ckpt.resolve_weights_path(p))
        merged = ckpt.merge_matching(params, loaded)
        n = sum(1 for _ in jax.tree.leaves(merged))
        print(f"[pretrained] merged by name from {p} ({n} leaves)")
        return merged

    def train(self, epochs_phase1: int | None = None, epochs_phase2: int | None = None,
              resume_from: str | Path | None = None,
              pretrained_weights: str | Path | None = None):
        """``resume_from``: checkpoint dir or params dir — phase 1 is skipped
        and phase 2 fine-tunes from those weights (the reference's
        ``--resume-from`` flow, ``train_adipose_unet_v3.py:1336-1339``);
        ``pretrained_weights``: by-name transfer into a fresh init before
        phase 1 (``--pretrained-weights``, :881-916)."""
        cfg = self.cfg
        tier = cfg.augment_level
        params = self.init_params()
        if pretrained_weights:
            params = self.load_pretrained(params, pretrained_weights)
        if resume_from is not None:
            loaded = ckpt.load_params(ckpt.resolve_weights_path(resume_from))
            params = jax.tree.map(jnp.asarray, loaded)

        ckpt.write_training_settings(self.ckpt_dir, {
            **{k: v for k, v in vars(cfg).items()},
            "use_deep_supervision": self.model_cfg.use_deep_supervision,
            "init_nb": self.model_cfg.init_nb,
            "tile_size": self.model_cfg.tile_size,
            "dropout_rate": self.model_cfg.dropout_rate,
            "dilation_rates": tuple(self.model_cfg.dilation_rates),
            "train_tiles": len(self.train_data),
            "val_tiles": len(self.val_data),
            "normalization_mean": self.mean,
            "normalization_std": self.std,
        })

        e1 = cfg.epochs_phase1 if epochs_phase1 is None else epochs_phase1
        e2 = cfg.epochs_phase2 if epochs_phase2 is None else epochs_phase2

        # Phase-2 preemption: when the saved progress is already in phase 2,
        # phase 1 is DONE — re-running it would clobber the phase-2 rolling
        # checkpoint metadata and restart phase 2 from scratch.
        resumed_past_phase1 = False
        if self.auto_resume and (self.ckpt_dir / "latest_state.json").exists():
            import json as _json

            meta = _json.loads((self.ckpt_dir / "latest_state.json").read_text())
            if meta.get("phase") == 2 and (self.ckpt_dir / "phase1_best").exists():
                best1 = ckpt.load_params(self.ckpt_dir / "phase1_best")
                dice1 = float("nan")
                resumed_past_phase1 = True
                print("[resume] phase 1 already complete; resuming phase 2")

        if resumed_past_phase1:
            pass
        elif resume_from is not None:
            best1, dice1 = params, float("nan")
        else:
            best1, dice1 = self._run_phase(
                1, params, e1, cfg.lr_phase1, cfg.min_lr,
                cfg.ema_decay_phase1, freeze_encoder=True, save_ema=False,
                augment_tier=tier,
            )
        best2, dice2 = self._run_phase(
            2, best1, e2, cfg.lr_phase2, cfg.min_lr * 0.1,
            cfg.ema_decay_phase2, freeze_encoder=False, save_ema=True,
            augment_tier=tier,
        )
        ckpt.save_params(self.ckpt_dir, "weights_best_overall", best2)
        try:
            from adipose_tpu.train.plots import plot_training_history

            plot_training_history(self.ckpt_dir)
        except Exception:
            pass  # plotting is best-effort; never fail a finished run
        return {"phase1_best_dice": dice1, "phase2_best_dice": dice2,
                "checkpoint_dir": str(self.ckpt_dir)}
