"""One-off: isolate pallas head kernel cost vs einsum on TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from adipose_tpu.ops.pallas.unet_kernels import diff_sigmoid_head

    print("backend:", jax.devices())
    rng = np.random.RandomState(0)
    # big operand generated ON DEVICE: a 4 GB host upload through the tunnel
    # stalls 20+ minutes (CLAUDE.md)
    x = jax.jit(lambda k: jax.random.normal(
        k, (16, 1024, 1024, 64), jnp.bfloat16))(jax.random.PRNGKey(0))
    x.block_until_ready()
    w = jnp.asarray(rng.randn(64).astype(np.float32))
    b = jnp.float32(0.1)

    @jax.jit
    def head_einsum(x, w, b):
        logit = jnp.einsum("bhwc,c->bhw", x, w.astype(x.dtype),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(logit + b)

    @jax.jit
    def head_pallas(x, w, b):
        return diff_sigmoid_head(x, w, b)

    for name, fn in [("einsum", head_einsum), ("pallas", head_pallas)]:
        try:
            out = fn(x, w, b)
            _ = float(out[0, 0, 0])
            t0 = time.perf_counter()
            outs = [fn(x, w, b) for _ in range(8)]
            _ = float(outs[-1][0, 0, 0])
            dt = (time.perf_counter() - t0) / 8
            print(f"{name}: {dt * 1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
