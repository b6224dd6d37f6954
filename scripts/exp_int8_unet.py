"""One-off: full int8 U-Net forward prototype (timing only, fake scales).

Mirrors the flagship inference config (lane_pad=64 level 1, fused decoder
upconvs, sigmoid-diff head) with int8 convs + int32 accumulate + f32 rescale
+ requantize epilogues, to measure the achievable end-to-end speedup before
building the real quantized-serving path.

Usage: python scripts/exp_int8_unet.py   (TPU, serialized)
"""
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.devices())
    B, H = 16, 1024
    key = jax.random.PRNGKey(0)

    def w8(key, kh, kw, ci, co):
        return jax.random.randint(key, (kh, kw, ci, co), -127, 127, jnp.int8)

    keys = iter(jax.random.split(key, 64))
    W = {
        "d1c1": w8(next(keys), 3, 3, 1, 64),
        "d1c2": w8(next(keys), 3, 3, 64, 64),
        "d2c1": w8(next(keys), 3, 3, 64, 88),
        "d2c2": w8(next(keys), 3, 3, 88, 88),
        "d3c1": w8(next(keys), 3, 3, 88, 176),
        "d3c2": w8(next(keys), 3, 3, 176, 176),
        **{f"dil{i}": w8(next(keys), 3, 3, 352 if i else 176, 352)
           for i in range(6)},
        "u3c1": w8(next(keys), 4, 4, 352, 176),
        "u3c2": w8(next(keys), 3, 3, 352, 176),
        "u3c3": w8(next(keys), 3, 3, 176, 176),
        "u2c1": w8(next(keys), 4, 4, 176, 88),
        "u2c2": w8(next(keys), 3, 3, 176, 88),
        "u2c3": w8(next(keys), 3, 3, 88, 88),
        "u1c1": w8(next(keys), 4, 4, 88, 64),
        "u1c2": w8(next(keys), 3, 3, 128, 64),
        "u1c3": w8(next(keys), 3, 3, 64, 64),
    }
    wd = jax.random.normal(next(keys), (64,), jnp.float32)

    def qconv(x8, k8, scale, **kw):
        y = jax.lax.conv_general_dilated(
            x8, k8, kw.pop("strides", (1, 1)), kw.pop("padding", "SAME"),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32, **kw)
        yf = y.astype(jnp.float32) * scale
        # relu + requantize in one epilogue
        return jnp.clip(jnp.round(jnp.maximum(yf, 0.0)), 0, 127).astype(jnp.int8)

    S = 1e-3  # fake uniform scale

    @jax.jit
    def predict(tiles_u8, W, wd):
        x = ((tiles_u8.astype(jnp.int32) - 127)).astype(jnp.int8)[..., None]
        d1 = qconv(qconv(x, W["d1c1"], S), W["d1c2"], S)
        p1 = -jax.lax.reduce_window(-d1, jnp.int8(127), jax.lax.min,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        d2 = qconv(qconv(p1, W["d2c1"], S), W["d2c2"], S)
        p2 = -jax.lax.reduce_window(-d2, jnp.int8(127), jax.lax.min,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        d3 = qconv(qconv(p2, W["d3c1"], S), W["d3c2"], S)
        p3 = -jax.lax.reduce_window(-d3, jnp.int8(127), jax.lax.min,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        d = p3
        taps = []
        for i in range(6):
            d = qconv(d, W[f"dil{i}"], S,
                      rhs_dilation=(2 ** i, 2 ** i))
            taps.append(d.astype(jnp.int32))
        bott = jnp.clip(sum(taps), 0, 127).astype(jnp.int8)

        def up(y, skip, k1, k2, k3):
            y = qconv(y, k1, S, padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2))
            y = jnp.concatenate([skip, y], axis=-1)
            y = qconv(qconv(y, k2, S), k3, S)
            return y

        u3 = up(bott, d3, W["u3c1"], W["u3c2"], W["u3c3"])
        u2 = up(u3, d2, W["u2c1"], W["u2c2"], W["u2c3"])
        u1 = up(u2, d1, W["u1c1"], W["u1c2"], W["u1c3"])
        logit = jnp.einsum("bhwc,c->bhw", u1.astype(jnp.bfloat16),
                           wd.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(logit * S)

    tiles = jax.jit(lambda k: jax.random.randint(
        k, (B, H, H), 0, 255, jnp.int32).astype(jnp.uint8))(next(keys))
    tiles.block_until_ready()
    print("input ready")

    out = predict(tiles, W, wd)
    _ = float(out[0, 0, 0])
    t0 = time.perf_counter()
    outs = [predict(tiles, W, wd) for _ in range(6)]
    _ = float(outs[-1][0, 0, 0])
    dt = (time.perf_counter() - t0) / 6
    print(f"int8 unet forward: {dt * 1e3:.1f} ms/batch = {B / dt:.1f} tiles/s")


if __name__ == "__main__":
    main()
