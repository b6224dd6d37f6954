"""TPU compiler options for inference jits.

XLA's conv emitter sizes its fusions against a scoped-VMEM budget whose
default (~16 MiB) is conservative for the 1024² conv shapes in this model.
Raising it to 32 MiB measured 88.7 → 93.1 tiles/s on the flagship forward
(v5e, batch 16; 64 MiB gives 93.5 — diminishing) with outputs differing only
in bf16 fusion-rounding (max |Δp| ≈ 2e-3, inside the noise band the project
accepts model-wide — see DiffSigmoidHead docstring).

Applied to INFERENCE jits only: training programs are HBM/VMEM-tight
(BASELINE.md b4/b8 rows) and keep the default budget.
"""

from __future__ import annotations

import jax

TPU_INFER_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def infer_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the measured-faster TPU inference compiler options.

    On non-TPU backends the options are dropped (other compilers reject the
    unknown flag). Usable as ``infer_jit(f)`` or ``@infer_jit`` or with jit
    kwargs: ``infer_jit(f, static_argnames=...)``.
    """
    def wrap(f):
        kw = dict(jit_kwargs)
        if jax.default_backend() == "tpu":
            opts = dict(TPU_INFER_COMPILER_OPTIONS)
            opts.update(kw.pop("compiler_options", {}) or {})
            kw["compiler_options"] = opts
        return jax.jit(f, **kw)

    return wrap(fun) if fun is not None else wrap
