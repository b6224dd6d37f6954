"""Stage-2 b4 compile-crash probe: depth bisect + XLA-flag attempts
(VERDICT r4 #2, follows scripts/exp_b4_probe.py).

exp_b4_probe found every sub-model prefix (enc1/enc2/dec1/2-level mini-UNet)
compiles a b4 1024² grad fine — only the FULL DilatedUNet fwd+bwd crashes
the remote tpu_compile_helper (HTTP 500, helper exit 1; compile-time OOM in
earlier rounds' diagnosis). This script:

  1. bisects DEPTH: 3-, 4-, 5-level plain U-Nets (no dilation) and the full
     model with the dilated bottleneck swapped for a plain conv pair — pins
     whether the crash tracks graph size or the dilated bottleneck;
  2. tries compiler_options on the smallest crashing config: scoped-VMEM
     budgets (8/16/96 MiB) and a reduced backend optimization level.

Each attempt is one bounded remote compile; a flag that lands turns the b4
batch envelope native. Usage: python scripts/exp_b4_flags.py (TPU, serialized)
"""
import time

import numpy as np


def main():
    import sys as _sys

    from adipose_tpu.core import watchdog

    if not watchdog.probe_device(180):
        _sys.exit("TPU tunnel wedged (probe_device timeout); not starting")
    watchdog.arm(900, "b4 flags probe: device wedged during init")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet

    print("backend:", jax.devices())
    B, S = 4, 1024
    key = key_for("b4flags")
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    class PlainUNet(nn.Module):
        """n_levels-deep plain U-Net, 44·2^k channels, full-res top level —
        the DilatedUNet skeleton minus dilation/DS/head details."""
        n_levels: int = 3

        @nn.compact
        def __call__(self, x):
            x = x[..., None].astype(bf) if x.ndim == 3 else x.astype(bf)
            skips = []
            nb = 44
            for _ in range(self.n_levels - 1):
                x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
                x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                nb *= 2
            x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
            x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
            for skip in reversed(skips):
                nb //= 2
                up = jax.image.resize(
                    x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                    "nearest")
                x = nn.relu(nn.Conv(nb, (2, 2), dtype=bf)(up))
                x = jnp.concatenate([skip, x], axis=-1)
                x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
                x = nn.relu(nn.Conv(nb, (3, 3), dtype=bf)(x))
            return nn.Conv(1, (1, 1), dtype=bf)(x)

    def probe(name, model, apply=None, options=None):
        watchdog.arm(900, f"b4 flags[{name}]: device wedged")
        apply = apply or (lambda m, p, x: m.apply(p, x))
        try:
            x = jnp.asarray(rng.rand(B, S, S).astype(np.float32))
            params = model.init(key, x[:1])

            def loss(p, xx):
                out = apply(model, p, xx)
                out = out[0] if isinstance(out, tuple) else out
                return jnp.sum(out.astype(jnp.float32))

            g = (jax.jit(jax.grad(loss), compiler_options=options)
                 if options else jax.jit(jax.grad(loss)))
            t0 = time.perf_counter()
            r = g(params, x)
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
            print(f"{name}: OK (compile {time.perf_counter() - t0:.0f}s)",
                  flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"{name}: CRASH {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return False

    # --- depth bisect (plain models, no compiler options)
    ok3 = probe("plain-unet 3-level", PlainUNet(3))
    ok4 = probe("plain-unet 4-level", PlainUNet(4)) if ok3 else False
    ok5 = probe("plain-unet 5-level", PlainUNet(5)) if ok4 else False

    mk_full = lambda **kw: DilatedUNet(init_nb=44, compute_dtype=bf,
                                       lane_pad=0, fast_head=False, **kw)
    apply_full = lambda m, p, x: m.apply(p, x)

    # --- flag attempts on the known-crashing full model
    for name, opts in (
        ("full model, vmem 8 MiB", {"xla_tpu_scoped_vmem_limit_kib": "8192"}),
        ("full model, vmem 16 MiB", {"xla_tpu_scoped_vmem_limit_kib": "16384"}),
        ("full model, vmem 96 MiB", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ("full model, opt level 1", {"xla_backend_optimization_level": "1"}),
    ):
        if probe(name, mk_full(), apply_full, options=opts):
            print(f"*** WORKAROUND FOUND: {opts}", flush=True)
            break
    watchdog.disarm()


if __name__ == "__main__":
    main()
