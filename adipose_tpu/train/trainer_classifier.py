"""Two-phase InceptionV3 classifier trainer.

Behavioral spec: ``Classification/train_adipose_classifier_v0.py:410-512``:
  phase 1 — frozen backbone, head-only, lr 1e-3, BCE(label_smoothing=0.1);
  phase 2 — backbone unfrozen from ``mixed7``, lr 1e-4;
  monitors ``val_auc`` (max): best checkpoint, ReduceLROnPlateau(0.5, patience),
  EarlyStopping(patience+2, restore best), CSV log;
  optional slide-level class weights (:180-233) — weights derived from how many
  SLIDES contribute to each class, not tile counts;
  per-tile percentile normalization before augmentation (:251-298);
  input pipeline: grayscale → percentile-norm → augment → resize 299² → 3-ch
  tile → inception preprocess — here all on device, as its own jitted
  program software-pipelined one batch ahead of the 299² train step
  (stably ~230 imgs/s b32, ≥ the fused single program within runtime noise
  and immune to the unpipelined split's multi-second dispatch pathology;
  521.9 imgs/s with opt-in --augment-low-res — BASELINE.md r3).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.core.config import ClassifierConfig, TrainConfig
from adipose_tpu.core.jitopts import infer_jit
from adipose_tpu.core.seeding import key_for, keys_for_batch_range
from adipose_tpu.data.loader import ClassificationDataset, prefetch_batches
from adipose_tpu.models.inception import (
    InceptionV3Classifier,
    backbone_param_mask,
    frozen_conv_boundary,
)
from adipose_tpu.ops import losses as L
from adipose_tpu.ops.metrics import roc_auc
from adipose_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from adipose_tpu.train import checkpoint as ckpt
from adipose_tpu.train.schedules import EarlyStopping, ReduceLROnPlateau
from adipose_tpu.train.state import (
    TrainState,
    classifier_stats_mask,
    make_optimizer,
    set_learning_rate,
)


def extract_slide_base(filename: str) -> str:
    """Strip the trailing ``_rX_cY`` tile suffix
    (``train_adipose_classifier_v0.py:152-177``)."""
    stem = Path(filename).stem
    parts = stem.split("_")
    for i in range(len(parts) - 2, -1, -1):
        if parts[i].startswith("r") and parts[i + 1].startswith("c"):
            return "_".join(parts[:i])
    return stem


def compute_image_level_class_weights(
    file_paths, labels, pos_weight_multiplier: float = 1.0
) -> dict:
    """Slide-level inverse-frequency weights (:180-233)."""
    slide_labels: dict = {}
    for path, label in zip(file_paths, labels):
        slide_labels.setdefault(extract_slide_base(str(path)), set()).add(int(label))
    slides_per_class = {0: 0, 1: 0}
    for label_set in slide_labels.values():
        for cls in (0, 1):
            if cls in label_set:
                slides_per_class[cls] += 1
    total = len(slide_labels)
    weights = {
        cls: (total / (2.0 * n) if n else 0.0)
        for cls, n in slides_per_class.items()
    }
    weights[1] *= pos_weight_multiplier
    return weights


def _percentile_norm_255(imgs, p_low: float, p_high: float, mesh=None):
    """Per-image percentile stretch back to [0, 255] — the shared TPU-fast
    dispatcher (:func:`adipose_tpu.ops.normalize.batched_percentile_unit_fast`:
    exact u8-CDF Pallas kernel on TPU, float sort elsewhere/for RGB)."""
    from adipose_tpu.ops.normalize import batched_percentile_unit_fast

    return batched_percentile_unit_fast(imgs, p_low, p_high, mesh=mesh) * 255.0


def _make_preprocess_step(percentile_norm: bool, p_low: float, p_high: float,
                          mesh=None, augment_low_res: bool = False,
                          batch_size: int | None = None):
    """u8/float tiles (K·B, H, W) + (K, 2) batch keys → K (B, 299, 299, 3)
    train inputs.

    Deliberately its OWN jitted program, separate from the train step: the
    epoch loop dispatches mega-batch m+1's preprocessing while the 299² train
    steps for mega-batch m are still in flight (the 1-deep pipeline is
    immune to the UNpipelined split's dispatch pathology: 5–30 s/step in 3
    of 5 runs — the axon runtime intermittently blocks when a
    just-dispatched program's output is consumed by the very next dispatch).
    MEGABATCHING (K train-batches per prep dispatch,
    :func:`adipose_tpu.data.augment.batched_classification_grouped` — draws
    bit-identical to K separate per-batch programs) amortizes the per-dispatch
    round-trip that dominated the split prep at K=1.
    scripts/bench_classifier_full_train.py; BASELINE.md r3/r4.

    ``augment_low_res`` (OPT-IN deviation, PARITY.md #15): run the
    augmentation AFTER the 299² resize — ~11.7× fewer pixels for the
    aug stage, which dominates the prep program at full res. The reference
    augments at native resolution (train_adipose_classifier_v0.py:274-276);
    D4/zoom/brightness/contrast commute with the bilinear resize, but gamma,
    blur and noise act at the lower resolution, so the default stays
    reference-order.

    32 MiB scoped-VMEM budget (infer_jit): the Pallas u8-CDF percentile
    kernel needs ~24 MiB of scoped VMEM for its (1, 1024, 1024) f32 blocks
    and does NOT compile at the 16 MiB default ("Ran out of memory in memory
    space vmem ... 23.82M and limit 16.00M", measured 2026-08-18).
    """
    from adipose_tpu.data.augment import batched_classification_grouped

    @infer_jit
    def prep(images_u8, aug_keys):
        keys = aug_keys if aug_keys.ndim == 2 else aug_keys[None]
        imgs = images_u8.astype(jnp.float32)
        if percentile_norm:
            imgs = _percentile_norm_255(imgs, p_low, p_high, mesh=mesh)
        if not augment_low_res:
            imgs = batched_classification_grouped(keys, imgs, mesh=mesh)
        # resize 299² → 3ch → inception preprocess (:286-297)
        x = jax.image.resize(imgs[..., None], (imgs.shape[0], 299, 299, 1), "bilinear")
        if augment_low_res:
            x = batched_classification_grouped(
                keys, x[..., 0], mesh=mesh)[..., None]
        out = jnp.tile(x, (1, 1, 1, 3)) / 127.5 - 1.0
        if batch_size is None:
            return out
        # K separate outputs (not one sliced-later array): each train step
        # consumes its own program result, avoiding per-step device slices
        k = out.shape[0] // batch_size
        return tuple(out[i * batch_size : (i + 1) * batch_size]
                     for i in range(k))

    return prep


def _make_train_step(model, label_smoothing: float, stats_mask,
                     frozen_below: int = 0):
    """Core 299² train step; consumes `_make_preprocess_step` outputs.

    ``frozen_below``: frozen backbone BNs normalize with MOVING stats during
    training (Keras ``trainable=False`` BN inference-mode behavior,
    ``train_adipose_classifier_v0.py:355-358``); ``stats_mask`` additionally
    pins their running stats (redundant for flax — inference-mode BNs don't
    mutate — but kept as the single source of truth for checkpoint resume)."""
    @partial(infer_jit, donate_argnums=(0,))
    def step(state: TrainState, x, labels, class_w, drop_key):

        def compute(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, frozen_below=frozen_below,
                rngs={"dropout": drop_key}, mutable=["batch_stats"],
            )
            ls = label_smoothing
            y = labels * (1.0 - ls) + 0.5 * ls
            per = -(y * jnp.log(jnp.clip(out, 1e-7, 1 - 1e-7))
                    + (1 - y) * jnp.log(jnp.clip(1 - out, 1e-7, 1 - 1e-7)))
            sample_w = jnp.where(labels > 0.5, class_w[1], class_w[0])
            loss = jnp.mean(per * sample_w)
            return loss, (out, mutated["batch_stats"])

        (loss, (probs, new_stats)), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        if stats_mask is not None:
            new_stats = jax.tree.map(
                lambda keep, new, old: jnp.where(keep, new, old),
                stats_mask, new_stats, state.batch_stats,
            )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        acc = jnp.mean(((probs > 0.5) == (labels > 0.5)).astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_inception_preprocess(percentile_norm: bool = True, p_low: float = 1.0,
                              p_high: float = 99.0, mesh=None):
    """(B, H, W) grayscale or (B, H, W, 3) RGB u8/float → (B, 299, 299, 3)
    inception-preprocessed.

    The reference's ``_preprocess`` path (``train_adipose_classifier_v0.py:
    251-298``): optional percentile norm → bilinear resize 299² → tile to
    3 channels → ``preprocess_input`` scaling. Shared by the val/inference
    step and the serving-bundle path (the exported classifier expects this
    input, mirroring the ONNX classifier's host-side preprocessing,
    ``classification_inference.py:288-320``).

    Returns a PLAIN (unjitted) function so callers can embed it in their own
    jitted step — ``infer_jit`` carries TPU compiler options, which JAX
    rejects on nested jits. Standalone users wrap it themselves.
    """
    def preprocess(images_u8):
        imgs = images_u8.astype(jnp.float32)
        if percentile_norm:
            imgs = _percentile_norm_255(imgs, p_low, p_high, mesh=mesh)
        if imgs.ndim == 4:  # (B, H, W, 3) RGB — legacy-classifier path, no tiling
            x = jax.image.resize(imgs, (imgs.shape[0], 299, 299, 3), "bilinear")
            return x / 127.5 - 1.0
        x = jax.image.resize(imgs[..., None], (imgs.shape[0], 299, 299, 1), "bilinear")
        return jnp.tile(x, (1, 1, 1, 3)) / 127.5 - 1.0

    return preprocess


def _make_val_step(model, percentile_norm: bool, p_low: float,
                   p_high: float, mesh=None):
    pre = make_inception_preprocess(percentile_norm, p_low, p_high, mesh=mesh)

    @infer_jit
    def step(params, batch_stats, images_u8):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            pre(images_u8), train=False,
        )

    return step


class ClassifierTrainer:
    def __init__(
        self,
        dataset_root: str | Path,
        cfg: TrainConfig | None = None,
        model_cfg: ClassifierConfig | None = None,
        label_smoothing: float = 0.1,
        percentile_norm: bool = True,
        use_class_weights: bool = False,
        pos_weight_multiplier: float = 1.0,
        checkpoint_root: str | Path = "checkpoints/classifier_runs",
        suffix: str = "",
        train_split: str = "train",
        val_split: str = "val",
        patience: int = 4,
        save_best_only: bool = True,
        pretrained_weights: str | Path | None = None,
        augment_low_res: bool = False,
        prep_megabatch: int = 4,
    ):
        # classifier LRs: 1e-3 warmup / 1e-4 fine-tune (:479-503)
        self.cfg = cfg or TrainConfig(batch_size=16, lr_phase1=1e-3,
                                      lr_phase2=1e-4)
        self.model_cfg = model_cfg or ClassifierConfig()
        self.label_smoothing = label_smoothing
        self.percentile_norm = percentile_norm
        self.patience = patience
        self.save_best_only = save_best_only
        self.pretrained_weights = pretrained_weights
        # opt-in: augment at 299² after the resize (PARITY.md deviation 15)
        self.augment_low_res = augment_low_res
        # K train-batches preprocessed per prep dispatch (1 disables) —
        # amortizes the axon per-dispatch round-trip; draws are bit-identical
        # to K=1 (batched_classification_grouped)
        self.prep_megabatch = max(1, int(prep_megabatch))
        self.mesh = make_mesh_for_batch(self.cfg.batch_size, self.cfg.num_devices)
        root = Path(dataset_root)
        self.train_data = ClassificationDataset(
            root / train_split, self.cfg.batch_size, self.cfg.seed,
            cache_limit_mb=self.cfg.cache_limit_mb)
        self.val_data = ClassificationDataset(
            root / val_split, self.cfg.batch_size, self.cfg.seed,
            cache_limit_mb=self.cfg.cache_limit_mb)
        if not len(self.train_data):
            raise FileNotFoundError(f"no classifier tiles under {root}")

        ts = ckpt.timestamp_now()
        norm_suffix = "_percentile" if percentile_norm else ""
        self.ckpt_dir = Path(checkpoint_root) / (
            f"{ts}_classifier_adipose_sybreosin{norm_suffix}{suffix}"
        )
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

        if use_class_weights:
            self.class_weights = compute_image_level_class_weights(
                self.train_data.files, self.train_data.labels, pos_weight_multiplier
            )
        else:
            self.class_weights = {0: 1.0, 1: 1.0}

        self.model = InceptionV3Classifier(
            dropout_rate=self.model_cfg.dropout_rate,
            dtype=jnp.bfloat16 if self.model_cfg.compute_dtype == "bfloat16" else jnp.float32,
        )
        (self.ckpt_dir / "config.json").write_text(json.dumps({
            "label_smoothing": label_smoothing,
            "percentile_norm": percentile_norm,
            "augment_low_res": augment_low_res,
            "class_weights": self.class_weights,
            **vars(self.cfg),
        }, indent=2, default=str))

    def init_variables(self):
        variables = self.model.init(
            key_for("classifier.init", self.cfg.seed), jnp.zeros((1, 299, 299, 3))
        )
        if self.pretrained_weights:
            variables = self._load_pretrained(variables, self.pretrained_weights)
        else:
            # The reference classifier is TRANSFER LEARNING from Keras
            # InceptionV3(weights='imagenet') (train_adipose_classifier_v0.py:
            # 312-319); its two-phase freeze schedule assumes that init. No
            # ImageNet weights ship with this environment, so without
            # --pretrained-weights (Keras ImageNet H5 or a compatible orbax
            # checkpoint) training starts from RANDOM init and will not
            # reproduce the reference's accuracy.
            print(
                "[classifier] WARNING: no --pretrained-weights given — "
                "backbone starts from RANDOM init, NOT the reference's "
                "ImageNet transfer learning (train_adipose_classifier_v0.py:"
                "312-319). Supply the Keras InceptionV3 ImageNet "
                ".h5 via --pretrained-weights to reproduce the reference."
            )
        return replicate(self.mesh, variables)

    @staticmethod
    def _load_pretrained(variables, path: str | Path):
        """Legacy transfer weights by name, skipping mismatches
        (``train_adipose_classifier_v0.py:322-353``): TF ``.h5`` via the
        importer, or an orbax checkpoint merged where shapes match."""
        p = Path(path)
        if p.suffix == ".h5" or p.name.endswith(".weights.h5"):
            from adipose_tpu.models.tf_import import import_inception_weights

            try:
                return import_inception_weights(p, variables)
            except ValueError as e:
                print(f"[pretrained] TF import skipped: {e}")
                return variables
        loaded = ckpt.load_params(ckpt.resolve_weights_path(p))
        return ckpt.merge_matching(variables, loaded)

    def _run_phase(self, phase: int, variables, epochs: int, lr: float,
                   unfreeze_from: str | None, patience: int = 3):
        cfg = self.cfg
        params, batch_stats = variables["params"], variables["batch_stats"]
        mask = backbone_param_mask(params, unfreeze_from)
        smask = classifier_stats_mask(batch_stats, mask)
        tx = make_optimizer(cfg.optimizer, lr, cfg.weight_decay, mask)
        state = TrainState.create(params, tx, batch_stats)
        prep_step = _make_preprocess_step(
            self.percentile_norm, cfg.percentile_low, cfg.percentile_high,
            mesh=self.mesh, augment_low_res=self.augment_low_res,
            batch_size=cfg.batch_size,
        )
        train_step = _make_train_step(
            self.model, self.label_smoothing, smask,
            frozen_below=frozen_conv_boundary(unfreeze_from))
        val_step = _make_val_step(
            self.model, self.percentile_norm, cfg.percentile_low,
            cfg.percentile_high, mesh=self.mesh,
        )
        plateau = ReduceLROnPlateau(lr=lr, patience=patience, min_lr=1e-6)
        stopper = EarlyStopping(patience=patience + 2)
        logger = ckpt.CsvLogger(self.ckpt_dir / "training.log")
        class_w = jnp.asarray([self.class_weights[0], self.class_weights[1]], jnp.float32)

        best_auc, best_vars = -np.inf, variables
        K = self.prep_megabatch
        for epoch in range(epochs):
            t0 = time.time()
            tms = []
            # Key schedule for the whole epoch in ONE device program
            # (per-iteration key_for dispatches are ~100 ms on axon —
            # BASELINE.md r3 lessons). pairs[b] replays exactly the old
            # per-batch split(key_for(..., epoch*100003+b)) → (aug, drop),
            # so augmentation/dropout draws are unchanged.
            max_b = -(-len(self.train_data) // cfg.batch_size) + 1
            pairs = keys_for_batch_range(
                f"cls.p{phase}", cfg.seed,
                epoch * 100003 + np.arange(max_b))

            # Software pipeline, one MEGA-batch deep: K train-batches are
            # uploaded + preprocessed per prep dispatch
            # (_make_preprocess_step megabatching), dispatched BEFORE the
            # previous mega's K train steps are consumed — the u8 transfer
            # and the norm/aug/resize program overlap the in-flight 299²
            # steps, and the prep round-trip is amortized over K steps.
            def mega_groups():
                buf = []
                for b, (imgs, labels) in enumerate(prefetch_batches(
                        self.train_data.epoch_batches(epoch))):
                    buf.append((b, imgs, labels))
                    if len(buf) == K:
                        yield buf
                        buf = []
                if buf:
                    yield buf

            pending = None
            for group in mega_groups():
                bs = [b for b, _, _ in group]
                imgs = np.concatenate([im for _, im, _ in group])
                imgs = shard_batch(self.mesh, imgs)
                xs = prep_step(imgs, jnp.asarray(pairs[bs, 0]))
                steps = [
                    (x, shard_batch(self.mesh, labels), class_w,
                     jnp.asarray(pairs[b, 1]))
                    for x, (b, _, labels) in zip(xs, group)
                ]
                if pending is not None:
                    for s in pending:
                        state, m = train_step(state, *s)
                        tms.append(m)
                pending = steps
            if pending is not None:
                for s in pending:
                    state, m = train_step(state, *s)
                    tms.append(m)
            probs, labels_all = [], []
            for imgs, labels in prefetch_batches(
                    self.val_data.epoch_batches(epoch, shuffle=False)):
                imgs = shard_batch(self.mesh, imgs)
                probs.append(np.asarray(val_step(state.params, state.batch_stats, imgs)))
                labels_all.append(labels)
            probs = np.concatenate(probs)
            labels_all = np.concatenate(labels_all)
            val_auc = float(roc_auc(jnp.asarray(probs), jnp.asarray(labels_all)))
            val_acc = float(np.mean((probs > 0.5) == (labels_all > 0.5)))
            row = {
                **{k: float(np.mean([float(x[k]) for x in tms])) for k in tms[0]},
                "val_auc": val_auc, "val_acc": val_acc,
                "lr": plateau.lr, "epoch_time_s": time.time() - t0,
            }
            logger.log(epoch, row)
            improved = val_auc > best_auc
            if improved:
                best_auc = val_auc
                best_vars = jax.device_get(
                    {"params": state.params, "batch_stats": state.batch_stats}
                )
            if improved or not self.save_best_only:
                # save_best_only=False mirrors Keras ModelCheckpoint: the
                # current epoch's weights land in the slot every epoch
                ckpt.save_params(self.ckpt_dir, "weights_best", jax.device_get(
                    {"params": state.params, "batch_stats": state.batch_stats}
                ) if not improved else best_vars)
            state = state.replace(opt_state=set_learning_rate(state.opt_state, plateau.update(val_auc)))
            if stopper.update(val_auc, epoch):
                break
        # EarlyStopping(restore_best_weights=True) semantics (:190-196)
        return best_vars, best_auc

    def train(self, warmup_epochs: int = 5, finetune_epochs: int = 20):
        variables = self.init_variables()
        v1, auc1 = self._run_phase(1, variables, warmup_epochs,
                                   self.cfg.lr_phase1, None,
                                   patience=self.patience)
        v2, auc2 = self._run_phase(
            2, v1, finetune_epochs, self.cfg.lr_phase2,
            self.model_cfg.unfreeze_from, patience=self.patience,
        )
        ckpt.save_params(self.ckpt_dir, "weights_final", v2)
        return {"phase1_val_auc": auc1, "phase2_val_auc": auc2,
                "checkpoint_dir": str(self.ckpt_dir)}
