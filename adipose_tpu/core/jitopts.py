"""TPU compiler options for the hot jitted programs.

XLA's conv emitter sizes its fusions against a scoped-VMEM budget whose
default (~16 MiB) is conservative for the 1024² conv shapes in this model.
All numbers below from v5e runs of ``scripts/exp_train_vmem.py`` and
``bench.py``; outputs differ only in bf16 fusion-rounding (max |Δp| ≈ 2e-3,
inside the noise band the project accepts model-wide — see DiffSigmoidHead
docstring).

* Inference (batch 16 forward): 32 MiB measured 88.7 → 93.1 tiles/s
  (64 MiB: 93.5 — diminishing).
* Training (batch 8 fused step): NON-monotonic — 32 MiB loses (14.85 →
  13.33 tiles/s) but 48 MiB wins (15.39; 64 MiB 15.17–15.33; repeats within
  ±0.1). Training uses its own 48 MiB budget via :func:`train_jit`.
"""

from __future__ import annotations

import jax

TPU_INFER_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
TPU_TRAIN_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def _trace_state_clean() -> bool:
    try:
        from jax._src.core import trace_state_clean

        return trace_state_clean()
    except Exception:
        return True


def _options_jit(options):
    def jit_like(fun=None, **jit_kwargs):
        def wrap(f):
            kw = dict(jit_kwargs)
            opts = dict(options)
            opts.update(kw.pop("compiler_options", {}) or {})
            if jax.default_backend() != "tpu":
                return jax.jit(f, **kw)
            tuned = jax.jit(f, compiler_options=opts, **kw)
            plain = jax.jit(f, **kw)

            # XLA rejects compiler_options on a jit nested inside another
            # trace; these wrappers compose freely (e.g. an infer_jit'ed
            # predict inside an infer_jit'ed TTA program), so dispatch on
            # trace state: tuned program at top level, plain (inlined) jit
            # when already tracing.
            import functools

            @functools.wraps(f)
            def dispatch(*a, **k):
                return tuned(*a, **k) if _trace_state_clean() else plain(*a, **k)

            dispatch.tuned = tuned
            dispatch.plain = plain
            return dispatch

        return wrap(fun) if fun is not None else wrap

    return jit_like


#: ``jax.jit`` with the measured-faster TPU compiler options for forward-only
#: programs. On non-TPU backends the options are dropped (other compilers
#: reject the unknown flag). Usable as ``infer_jit(f)`` or ``@infer_jit`` or
#: with jit kwargs: ``infer_jit(f, static_argnames=...)``.
infer_jit = _options_jit(TPU_INFER_COMPILER_OPTIONS)

#: Same, with the training-tuned scoped-VMEM budget (48 MiB). The trainers'
#: compile-OOM retry ladder (trainer_unet.py) still applies on top: a batch
#: size whose program can't compile under this budget surfaces as a vmem/hbm
#: compile error and falls back to remat exactly as before.
train_jit = _options_jit(TPU_TRAIN_COMPILER_OPTIONS)
