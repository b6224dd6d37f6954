"""One-off: does XLA lower int8 convs to the v5e's 2x-rate int8 MXU path?

Times a 3x3 64->64 conv @1024^2 b16 in bf16 vs int8 (with quant/dequant
epilogues as a real quantized pipeline would chain them).

Usage: python scripts/exp_int8_conv.py   (TPU, serialized)
"""
import time


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.devices())
    key = jax.random.PRNGKey(0)
    kx, kk = jax.random.split(key)

    x8 = jax.jit(lambda k: jax.random.randint(
        k, (16, 1024, 1024, 64), -127, 127, jnp.int8))(kx)
    k8 = jax.jit(lambda k: jax.random.randint(
        k, (3, 3, 64, 64), -127, 127, jnp.int8))(kk)
    xb = jax.jit(lambda x: (x.astype(jnp.bfloat16) / 127.0))(x8)
    kb = jax.jit(lambda k: (k.astype(jnp.bfloat16) / 127.0))(k8)
    for a in (x8, k8, xb, kb):
        a.block_until_ready()
    print("operands ready")

    def conv(x, k, ptype):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    @jax.jit
    def conv_bf16(x, k):
        y = conv(x, k, jnp.bfloat16)
        return jnp.max(y)

    @jax.jit
    def conv_int8(x, k):
        y = conv(x, k, jnp.int32)          # int8 x int8 -> int32 accumulate
        yq = (y.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / (127 * 127)))
        return jnp.max(yq)

    @jax.jit
    def conv_int8_chain(x, k):
        # realistic chained form: int8 in -> conv -> rescale -> requantize
        y = conv(x, k, jnp.int32)
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / 127.0)),
                      -127, 127).astype(jnp.int8)
        return jnp.sum(yq.astype(jnp.int32))

    for name, fn, args in [
        ("bf16      ", conv_bf16, (xb, kb)),
        ("int8->bf16", conv_int8, (x8, k8)),
        ("int8->int8", conv_int8_chain, (x8, k8)),
    ]:
        try:
            out = fn(*args)
            _ = float(out)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(6)]
            _ = float(outs[-1])
            dt = (time.perf_counter() - t0) / 6
            print(f"{name}: {dt * 1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
