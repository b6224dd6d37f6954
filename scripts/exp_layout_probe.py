"""One-off: can a Pallas kernel live inside the conv chain WITHOUT relayout?

The conv layout {3,0,2,1} of (B,H,W,C) is byte-identical to the DEFAULT
layout of logical (H,W,B,C). If jnp.transpose(B,H,W,C)->(H,W,B,C) lowers to
a layout-change bitcast (no data movement), a Pallas kernel can consume and
produce the transposed logical shape for free. This probe inserts a Pallas
identity between two convs via that trick and compares against the plain
chain.

Usage: python scripts/exp_layout_probe.py   (TPU, serialized)
"""
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("backend:", jax.devices())
    B, H, C = 16, 1024, 64
    key = jax.random.PRNGKey(0)
    kx, k1, k2 = jax.random.split(key, 3)
    x = jax.jit(lambda k: jax.random.normal(k, (B, H, H, C), jnp.bfloat16))(kx)
    w1 = jax.jit(lambda k: 0.05 * jax.random.normal(k, (3, 3, C, C), jnp.bfloat16))(k1)
    w2 = jax.jit(lambda k: 0.05 * jax.random.normal(k, (3, 3, C, C), jnp.bfloat16))(k2)
    jax.block_until_ready((x, w1, w2))
    print("ready")

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def ident_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    def pallas_ident_hwbc(t):  # t: (H, W, B, C)
        h, w, b, c = t.shape
        return pl.pallas_call(
            ident_kernel,
            grid=(h,),
            in_specs=[pl.BlockSpec((1, w, b, c), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, w, b, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((h, w, b, c), t.dtype),
        )(t)

    @jax.jit
    def chain_plain(x, w1, w2):
        y = jax.nn.relu(conv(x, w1))
        return jnp.max(conv(y, w2))

    @jax.jit
    def chain_pallas(x, w1, w2):
        y = jax.nn.relu(conv(x, w1))
        t = jnp.transpose(y, (1, 2, 0, 3))      # (H,W,B,C)
        t = pallas_ident_hwbc(t)
        y2 = jnp.transpose(t, (2, 0, 1, 3))     # back to (B,H,W,C)
        return jnp.max(conv(y2, w2))

    for name, fn in [("plain       ", chain_plain),
                     ("pallas-ident", chain_pallas)]:
        try:
            out = fn(x, w1, w2)
            _ = float(out)
            t0 = time.perf_counter()
            outs = [fn(x, w1, w2) for _ in range(6)]
            _ = float(outs[-1])
            dt = (time.perf_counter() - t0) / 6
            print(f"{name}: {dt * 1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
