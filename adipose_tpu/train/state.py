"""Train-state, optimizers, and jitted train/eval steps for both models.

Maps the reference's Keras ``compile_model``/``fit`` machinery
(``train_adipose_unet_v3.py:780-879``, ``train_adipose_classifier_v0.py:372-378``)
onto optax + jit:

  * loss matrix {standard | label-smoothing | OHEM | OHEM+smoothing} ×
    {deep supervision on/off} becomes a pure loss fn selected once;
  * two-phase freezing (``freeze_encoder_layers``/``unfreeze_encoder``,
    ``freeze_backbone``/``unfreeze_from_layer``) becomes an
    ``optax.multi_transform`` over a trainability mask — fresh optimizer state
    per phase, exactly like Keras recompilation;
  * the learning rate is an injected hyperparameter so host-side schedules
    (cosine/plateau/CLR) set it per epoch without recompiling;
  * steps are jitted with donated state; with inputs sharded over the mesh's
    'data' axis, GSPMD partitions the step and all-reduces grads over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct

from adipose_tpu.core.jitopts import infer_jit, train_jit
from adipose_tpu.ops import losses as L


# ---- Loss selection (compile_model matrix) ----------------------------------


def unet_loss_from_config(cfg) -> Callable:
    """Pick the main/aux loss functions per TrainConfig
    (``train_adipose_unet_v3.py:795-879``)."""
    if cfg.use_label_smoothing and cfg.use_hard_mining:
        main = partial(
            L.ohem_loss_with_smoothing,
            keep_ratio=cfg.ohem_ratio,
            epsilon_pos=cfg.epsilon_pos,
            epsilon_neg=cfg.epsilon_neg,
        )
        aux = partial(
            L.combined_loss_with_label_smoothing,
            epsilon_pos=cfg.epsilon_pos,
            epsilon_neg=cfg.epsilon_neg,
        )
    elif cfg.use_label_smoothing:
        main = aux = partial(
            L.combined_loss_with_label_smoothing,
            epsilon_pos=cfg.epsilon_pos,
            epsilon_neg=cfg.epsilon_neg,
        )
    elif cfg.use_hard_mining:
        main = partial(L.ohem_loss, keep_ratio=cfg.ohem_ratio)
        aux = L.combined_loss_standard
    else:
        main = aux = L.combined_loss_standard

    def loss_fn(y_true, outputs):
        if isinstance(outputs, dict):
            return L.deep_supervision_loss(
                y_true, outputs, main, aux,
                cfg.ds_weight_main, cfg.ds_weight_aux1, cfg.ds_weight_aux2,
            )
        return main(y_true, outputs)

    return loss_fn


# ---- Optimizer --------------------------------------------------------------


class _KerasAdamState(struct.PyTreeNode):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_keras_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7
) -> optax.GradientTransformation:
    """TF/Keras Adam's exact update form (tf_keras ``Adam.update_step``):

        θ -= lr · √(1−β₂ᵗ)/(1−β₁ᵗ) · m / (√v + ε)

    with ε (Keras default 1e-7) added OUTSIDE the *uncorrected* √v.
    ``optax.scale_by_adam`` instead computes m̂/(√v̂+ε) with bias-corrected
    v̂ = v/(1−β₂ᵗ), so its ε is effectively Keras's ε/√(1−β₂ᵗ) — a 31.6×
    mismatch at step 1. The reference compiles plain ``Adam(learning_rate=lr)``
    (``train_adipose_unet_v3.py:805``, ``train_adipose_classifier_v0.py:370``);
    one-step parity is pinned by tests/test_tf_oracle.py::TestTrainingOracle.
    """

    def init_fn(params):
        return _KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda g, m: m + (1 - b1) * (g - m), updates, state.mu)
        nu = jax.tree.map(lambda g, v: v + (1 - b2) * (g * g - v), updates, state.nu)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree.map(lambda m, v: alpha * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, _KerasAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _keras_adam(learning_rate: float) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_keras_adam(), optax.scale_by_learning_rate(learning_rate)
    )


def _keras_adamw(
    learning_rate: float, weight_decay: float
) -> optax.GradientTransformation:
    # Keras AdamW applies decoupled decay θ·wd·lr in apply_gradients before
    # update_step; since the adam term doesn't read θ, that equals optax's
    # add-then-scale ordering exactly.
    return optax.chain(
        scale_by_keras_adam(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(
    optimizer: str = "adam",
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    trainable_mask: Any | None = None,
) -> optax.GradientTransformation:
    """Adam or AdamW (reference :806-813) in Keras's exact update form (see
    ``scale_by_keras_adam``), with optional frozen-leaf mask and an injected
    learning rate (``.hyperparams['learning_rate']``)."""
    if optimizer.lower() == "adamw":
        base = optax.inject_hyperparams(_keras_adamw)(
            learning_rate=lr, weight_decay=weight_decay
        )
    else:
        base = optax.inject_hyperparams(_keras_adam)(learning_rate=lr)
    if trainable_mask is None:
        return base
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
    )


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR inside (possibly multi_transform-wrapped) state."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            return True
        found = False
        if hasattr(state, "inner_states"):  # multi_transform
            for sub in state.inner_states.values():
                found |= visit(sub.inner_state)
        elif isinstance(state, tuple):
            for sub in state:
                found |= visit(sub)
        return found

    visit(opt_state)
    return opt_state


# ---- State ------------------------------------------------------------------


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None  # InceptionV3 BN moving stats; None for U-Net

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            batch_stats=batch_stats,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


# ---- U-Net steps ------------------------------------------------------------


def make_unet_train_step(model, loss_fn):
    """Returns jitted ``step(state, images, masks, rng) -> (state, metrics)``.

    images: (B, H, W) normalized float32; masks: (B, H, W) {0,1}.
    """

    @partial(train_jit, donate_argnums=(0,))
    def step(state: TrainState, images, masks, rng):
        def compute(params):
            out = model.apply(params, images, train=True, rngs={"dropout": rng})
            loss = loss_fn(masks, out)
            main = out["main_out"] if isinstance(out, dict) else out
            return loss, main

        (loss, main), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "dice_coef": L.dice_coef(masks, main),
        }
        return new_state, metrics

    return step


def make_unet_eval_step(model, loss_fn):
    @infer_jit
    def step(params, images, masks):
        out = model.apply(params, images, train=False)
        main = out["main_out"] if isinstance(out, dict) else out
        return {
            "loss": loss_fn(masks, out),
            "dice_coef": L.dice_coef(masks, main),
        }

    return step


def make_unet_predict(model):
    @infer_jit
    def predict(params, images):
        out = model.apply(params, images, train=False)
        return out["main_out"] if isinstance(out, dict) else out

    return predict


# ---- Classifier steps -------------------------------------------------------


def make_classifier_train_step(model, label_smoothing: float = 0.1,
                               stats_mask: Any | None = None,
                               frozen_below: int = 0):
    """Classifier step with BN stats. ``frozen_below`` makes frozen backbone
    BNs normalize with MOVING stats during training (Keras ``trainable=False``
    BN inference-mode semantics); ``stats_mask`` pins their running stats
    across the step."""

    # Default scoped-VMEM budget: the U-Net train_jit 48 MiB budget measured
    # neutral-to-negative on the 299² InceptionV3 program (1151 vs 1151-1165
    # imgs/s, scripts/bench_classifier_train.py).
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, labels, rng):
        def compute(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                frozen_below=frozen_below,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss = L.bce_with_label_smoothing(labels, out, label_smoothing)
            return loss, (out, mutated["batch_stats"])

        (loss, (probs, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        if stats_mask is not None:
            new_stats = jax.tree.map(
                lambda keep, new, old: jnp.where(keep, new, old),
                stats_mask, new_stats, state.batch_stats,
            )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        acc = jnp.mean(((probs > 0.5) == (labels > 0.5)).astype(jnp.float32))
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_classifier_predict(model):
    @infer_jit
    def predict(params, batch_stats, images):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )

    return predict


def classifier_stats_mask(batch_stats, param_mask):
    """Derive a BN-stats update mask from the param trainability mask: stats of
    a frozen ConvBN do not update. This masks only the stats UPDATE; the
    inference-mode NORMALIZATION half of Keras's frozen-BN behavior is the
    ``frozen_below`` argument of the model/train step (r3 verdict item 2)."""
    flat_params = flax.traverse_util.flatten_dict(param_mask)
    # trainability is uniform within a cbn_<i> module; index by its path prefix
    trainable_prefix = {}
    for path, v in flat_params.items():
        cbn = tuple(p for p in path if p.startswith("cbn_") or p == "backbone")
        trainable_prefix[cbn] = trainable_prefix.get(cbn, False) or bool(v)
    flat_stats = flax.traverse_util.flatten_dict(batch_stats)
    mask = {}
    for path in flat_stats:
        cbn = tuple(p for p in path if p.startswith("cbn_") or p == "backbone")
        mask[path] = trainable_prefix.get(cbn, True)
    return flax.traverse_util.unflatten_dict(mask)
