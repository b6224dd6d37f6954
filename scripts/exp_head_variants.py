"""One-off: head reformulation variants on TPU, with a realistic conv
producer in-graph so the operand layout matches the real model ({3,0,2,1}).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices())
    rng = np.random.RandomState(0)
    # generate the big operand ON DEVICE: 4 GB host->device through the
    # tunnel stalls for 20+ minutes
    x0 = jax.jit(lambda k: jax.random.normal(
        k, (16, 1024, 1024, 64), jnp.bfloat16))(jax.random.PRNGKey(0))
    x0.block_until_ready()
    print("x0 ready")
    k = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    wd = jnp.asarray(rng.randn(64).astype(np.float32))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_only(x):
        return jnp.max(conv(x))  # tiny epilogue, isolates conv cost

    @jax.jit
    def head_einsum(x):
        y = jax.nn.relu(conv(x))
        logit = jnp.einsum("bhwc,c->bhw", y, wd.astype(y.dtype),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(logit + 0.1)

    def head_cols(x, ncols):
        y = jax.nn.relu(conv(x))
        wmat = jnp.zeros((64, ncols), jnp.float32).at[:, 0].set(wd)
        out = jax.lax.dot_general(
            y, wmat.astype(y.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.sigmoid(out[..., 0] + 0.1)

    head8 = jax.jit(lambda x: head_cols(x, 8))
    head128 = jax.jit(lambda x: head_cols(x, 128))

    @jax.jit
    def head_conv1x1(x):
        y = jax.nn.relu(conv(x))
        w1 = jnp.zeros((1, 1, 64, 8), jnp.float32).at[:, :, :, 0].set(wd)
        out = jax.lax.conv_general_dilated(
            y, w1.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.sigmoid(out[..., 0].astype(jnp.float32) + 0.1)

    variants = [
        ("conv_only   ", conv_only),
        ("einsum      ", head_einsum),
        ("dot8+slice  ", head8),
        ("dot128+slice", head128),
        ("conv1x1(8)  ", head_conv1x1),
    ]
    for name, fn in variants:
        try:
            out = fn(x0)
            _ = float(out.ravel()[0])
            t0 = time.perf_counter()
            outs = [fn(x0) for _ in range(6)]
            _ = float(outs[-1].ravel()[0])
            dt = (time.perf_counter() - t0) / 6
            print(f"{name}: {dt * 1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
