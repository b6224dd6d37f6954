"""Paired image/mask augmentation — fully on-device, vmapped over the batch.

Behavioral spec: ``src/utils/data.py:13-393`` — four tiers (light / moderate /
heavy / tta_style) plus the mask-free grayscale classifier pipeline, composed
from: rot90/flips, brightness/contrast/gamma, Gaussian blur/noise, center
zoom, and elastic deformation.

TPU-native design (this is the reference's throughput bottleneck — a GIL-bound
``tf.py_function`` generator, ``train_adipose_unet_v3.py:568-607``):
  * every primitive is a pure jnp function of (key, image, mask) with STATIC
    shapes — random zoom and elastic warp go through one shared bilinear
    ``map_coordinates`` resample instead of dynamic resize/crop/pad;
  * probabilities use ``jnp.where`` masking, not Python branches, so one jitted
    program covers all random draws;
  * a whole batch augments as ``vmap(augment_fn)(keys, images, masks)`` fused
    into the training step — zero host work after the initial tile load.

Images are float32 in [0, 255] (grayscale (H, W)); masks are float32 {0,1}.
The RNG tree derives from seed.csv via :func:`adipose_tpu.core.key_for`, so
runs are deterministic regardless of worker layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from adipose_tpu.ops.d4 import apply_transform, apply_transform_batch


# ---- Geometric primitives ---------------------------------------------------




def random_rotation_90(key, image, mask):
    """(``data.py:13-18``)"""
    k = jax.random.randint(key, (), 0, 4)
    return apply_transform(image, k), apply_transform(mask, k)


def random_d4(key, image, mask):
    """One uniform D4 transform for the pair.

    Distribution-equivalent to the reference's independent rot90(k) draw +
    LR/UD coin flips (``data.py:13-29``): the 4×2×2 = 16 (k, lr, ud) combos
    map exactly 2:1 onto the 8 D4 elements, so a single uniform id ∈ [0, 8)
    is the same law (documented in PARITY.md). One draw lets the batch path
    apply the whole geometric stage as :func:`apply_transform_batch` —
    see that docstring for why vmapped per-sample rot90 is catastrophic on
    TPU.
    """
    tid = jax.random.randint(key, (), 0, 8)
    return apply_transform(image, tid), apply_transform(mask, tid)


def random_flip(key, image, mask):
    """(``data.py:21-29``)"""
    k1, k2 = jax.random.split(key)
    do_lr = jax.random.uniform(k1) > 0.5
    do_ud = jax.random.uniform(k2) > 0.5
    image = jnp.where(do_lr, jnp.flip(image, axis=1), image)
    mask = jnp.where(do_lr, jnp.flip(mask, axis=1), mask)
    image = jnp.where(do_ud, jnp.flip(image, axis=0), image)
    mask = jnp.where(do_ud, jnp.flip(mask, axis=0), mask)
    return image, mask


def random_brightness(key, image, factor_range=(0.7, 1.3)):
    """(``data.py:32-35``)"""
    f = jax.random.uniform(key, (), minval=factor_range[0], maxval=factor_range[1])
    return jnp.clip(image * f, 0.0, 255.0)


def random_contrast(key, image, factor_range=(0.7, 1.3)):
    """(``data.py:38-42``)"""
    f = jax.random.uniform(key, (), minval=factor_range[0], maxval=factor_range[1])
    m = jnp.mean(image)
    return jnp.clip((image - m) * f + m, 0.0, 255.0)


def random_gamma(key, image, gamma_range=(0.7, 1.3)):
    """(``data.py:45-50``)"""
    g = jax.random.uniform(key, (), minval=gamma_range[0], maxval=gamma_range[1])
    return jnp.power(jnp.clip(image / 255.0, 0.0, 1.0), g) * 255.0


_BLUR_RADIUS = 5  # supports sigma ≤ ~1.7 (reference max 1.5)


def _blur_fixed(image, sigma):
    """Gaussian blur with a fixed kernel support and traced sigma.

    TPU-native: 2·R+1 statically-shifted weighted adds per axis instead of a
    single-channel conv. With C_in = 1, XLA's conv layout assignment puts the
    vmapped batch dim into the 128-lane position ({0,2,1}, 16× padded at
    B=8) and that choice infects every downstream fusion — a standalone b8
    elastic program failed to even allocate (22 GB of padded temps). Shifted
    adds are layout-neutral VPU work with identical weights (summation order
    differs from the conv by float reassociation only).
    """
    x = jnp.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    k = k / jnp.sum(k)
    h, w = image.shape
    taps = 2 * _BLUR_RADIUS + 1
    padded = jnp.pad(image, ((_BLUR_RADIUS, _BLUR_RADIUS), (0, 0)), mode="reflect")
    out = jnp.zeros_like(image)
    for i in range(taps):
        out = out + k[i] * jax.lax.slice_in_dim(padded, i, i + h, axis=0)
    padded2 = jnp.pad(out, ((0, 0), (_BLUR_RADIUS, _BLUR_RADIUS)), mode="reflect")
    out2 = jnp.zeros_like(image)
    for i in range(taps):
        out2 = out2 + k[i] * jax.lax.slice_in_dim(padded2, i, i + w, axis=1)
    return out2


def random_gaussian_blur(key, image, sigma_range=(0.0, 1.5), prob=0.3):
    """(``data.py:53-60``): applied with prob, skipped when sigma < 0.1."""
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) <= prob
    sigma = jax.random.uniform(k2, (), minval=sigma_range[0], maxval=sigma_range[1])
    blurred = _blur_fixed(image, sigma)
    return jnp.where(apply & (sigma >= 0.1), blurred, image)


def random_gaussian_noise(key, image, std_range=(0.0, 10.0), prob=0.3):
    """(``data.py:63-69``)"""
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.uniform(k1) <= prob
    std = jax.random.uniform(k2, (), minval=std_range[0], maxval=std_range[1])
    noise = jax.random.normal(k3, image.shape) * std
    return jnp.where(apply, jnp.clip(image + noise, 0.0, 255.0), image)


def _reflect_coords(src: jax.Array, n: int) -> jax.Array:
    """Reflect out-of-range sample coordinates into [0, n−1] (mirror mode)."""
    period = 2.0 * (n - 1)
    s = jnp.mod(src, period)
    return jnp.where(s > (n - 1), period - s, s)


def _axis_weights(src: jax.Array, n: int, order: int) -> jax.Array:
    """(n_out, n) interpolation matrix: row i holds the weights over source
    positions for output coordinate src[i]. order 1 = tent (bilinear),
    order 0 = nearest one-hot."""
    j = jnp.arange(n, dtype=jnp.float32)[None, :]
    d = jnp.abs(src[:, None] - j)
    if order == 0:
        return (d <= 0.5).astype(jnp.float32) * (
            jnp.cumsum((d <= 0.5).astype(jnp.float32), axis=1) <= 1.0
        )
    return jnp.maximum(0.0, 1.0 - d)


def random_scale(key, image, mask, scale_range=(0.85, 1.15), prob=0.5):
    """Center zoom in/out with same-size output (``data.py:72-106``).

    TPU-native: an axis-aligned zoom is a SEPARABLE resample, so it runs as
    two dense matmuls on the MXU — ``W_y @ X @ W_xᵀ`` with banded tent
    matrices — instead of a 1M-pixel gather (``map_coordinates`` gathers
    measured ~80 ms/tile on v5e; the matmul form is ~4.3 GFLOP ≈ sub-ms).
    Zoom-out reflects the image at borders and zero-fills the mask, matching
    the reference's reflect-pad / constant-pad behavior.
    """
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) <= prob
    scale = jax.random.uniform(k2, (), minval=scale_range[0], maxval=scale_range[1])
    h, w = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    src_y = (jnp.arange(h, dtype=jnp.float32) - cy) / scale + cy
    src_x = (jnp.arange(w, dtype=jnp.float32) - cx) / scale + cx

    in_y = (src_y >= 0) & (src_y <= h - 1)
    in_x = (src_x >= 0) & (src_x <= w - 1)
    ry = _reflect_coords(src_y, h)
    rx = _reflect_coords(src_x, w)

    wy_img = _axis_weights(ry, h, order=1)
    wx_img = _axis_weights(rx, w, order=1)
    img_s = wy_img @ image @ wx_img.T

    wy_m = _axis_weights(src_y, h, order=0) * in_y[:, None]
    wx_m = _axis_weights(src_x, w, order=0) * in_x[:, None]
    mask_s = wy_m @ mask @ wx_m.T

    return (
        jnp.where(apply, img_s, image),
        jnp.where(apply, mask_s, mask),
    )


def _warp_axis(img: jax.Array, delta: jax.Array, axis: int, order: int,
               max_shift: int) -> jax.Array:
    """1-D warp along ``axis`` by a BOUNDED per-pixel displacement.

    TPU-native: instead of a gather (``map_coordinates``/``take_along_axis``
    both measured ~80-100 ms/tile on v5e), decompose the warp into a weighted
    sum over 2·max_shift+1 statically-shifted copies — pure VPU selects that
    XLA fuses into one pass: out = Σ_s w_s(p)·img(p+s) with
    w_s = [⌊δ⌋=s](1−frac) + [⌊δ⌋=s−1]·frac (bilinear) or [round(δ)=s]
    (nearest). Exact for |δ| ≤ max_shift. The image is edge-padded ONCE and
    every shift is a static slice of that one buffer (padding per shift
    materializes 2·max_shift+1 separate copies).
    """
    n = img.shape[axis]
    hi = max_shift + (0 if order == 0 else 1)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (max_shift, hi)
    padded = jnp.pad(img, pad, mode="edge")

    def shifted(s):
        # source position p+s sits at offset max_shift+s into the padded axis
        return jax.lax.slice_in_dim(padded, max_shift + s, max_shift + s + n,
                                    axis=axis)

    if order == 0:
        k = jnp.round(delta)
        out = jnp.zeros_like(img)
        for s in range(-max_shift, max_shift + 1):
            out = out + (k == s).astype(img.dtype) * shifted(s)
        return out
    k0 = jnp.floor(delta)
    f = (delta - k0).astype(img.dtype)
    out = jnp.zeros_like(img)
    for s in range(-max_shift, max_shift + 2):
        w = (k0 == s).astype(img.dtype) * (1.0 - f) + (k0 == s - 1).astype(img.dtype) * f
        out = out + w * shifted(s)
    return out


def elastic_transform(key, image, mask, alpha=10.0, sigma=3.0):
    """Smooth random warp (``data.py:109-143``): blurred uniform displacement
    fields scaled by alpha; bilinear for image, nearest for mask.

    TPU-native deviation (documented in PARITY.md): the joint 2-D remap is
    computed as TWO sequential axis-aligned warps (vertical by dy, then
    horizontal by dx). For the smooth, small displacements used here
    (|d| ≤ alpha, field blurred at σ) the difference from the joint remap is
    O(dx·dy·∂²img) — visually indistinguishable — while each pass is an
    axis-aligned gather the TPU executes efficiently.
    """
    k1, k2 = jax.random.split(key)
    h, w = image.shape
    dx = _blur_fixed(jax.random.uniform(k1, (h, w)) * 2.0 - 1.0, sigma) * alpha
    dy = _blur_fixed(jax.random.uniform(k2, (h, w)) * 2.0 - 1.0, sigma) * alpha
    max_shift = int(np.ceil(float(alpha)))  # |blurred U(-1,1)·α| ≤ α
    img_d = _warp_axis(_warp_axis(image, dy, 0, 1, max_shift), dx, 1, 1, max_shift)
    mask_d = _warp_axis(_warp_axis(mask, dy, 0, 0, max_shift), dx, 1, 0, max_shift)
    return img_d, mask_d


def _maybe_elastic(key, image, mask, prob, alpha, sigma):
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) > (1.0 - prob)
    img_e, mask_e = elastic_transform(k2, image, mask, alpha, sigma)
    return jnp.where(apply, img_e, image), jnp.where(apply, mask_e, mask)


def _maybe(key, fn, image, prob):
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) > (1.0 - prob)
    return jnp.where(apply, fn(k2, image), image)


# ---- Tiers (data.py:148-339) ------------------------------------------------


def _rest_heavy(key, image, mask):
    ks = jax.random.split(key, 7)
    image, mask = random_scale(ks[0], image, mask, (0.9, 1.1), prob=0.5)
    image, mask = _maybe_elastic(ks[1], image, mask, prob=0.3, alpha=15.0, sigma=3.0)
    image = _maybe(ks[2], lambda k, im: random_brightness(k, im, (0.8, 1.2)), image, 0.7)
    image = _maybe(ks[3], lambda k, im: random_contrast(k, im, (0.8, 1.2)), image, 0.7)
    image = _maybe(ks[4], lambda k, im: random_gamma(k, im, (0.8, 1.2)), image, 0.7)
    image = random_gaussian_blur(ks[5], image, (0.0, 1.0), prob=0.2)
    image = random_gaussian_noise(ks[6], image, (0.0, 5.0), prob=0.2)
    return image, mask


def _rest_moderate(key, image, mask):
    ks = jax.random.split(key, 5)
    image, mask = random_scale(ks[0], image, mask, (0.95, 1.05), prob=0.3)
    image, mask = _maybe_elastic(ks[1], image, mask, prob=0.15, alpha=8.0, sigma=3.0)
    image = _maybe(ks[2], lambda k, im: random_brightness(k, im, (0.9, 1.1)), image, 0.5)
    image = _maybe(ks[3], lambda k, im: random_contrast(k, im, (0.9, 1.1)), image, 0.5)
    image = random_gaussian_blur(ks[4], image, (0.0, 0.8), prob=0.15)
    return image, mask


def _rest_light(key, image, mask):
    image = _maybe(key, lambda k, im: random_brightness(k, im, (0.95, 1.05)), image, 0.3)
    return image, mask


def _rest_tta_style(key, image, mask):
    ks = jax.random.split(key, 5)
    image, mask = random_scale(ks[0], image, mask, (0.95, 1.05), prob=0.3)
    image = _maybe(ks[1], lambda k, im: random_brightness(k, im, (0.85, 1.15)), image, 0.6)
    image = _maybe(ks[2], lambda k, im: random_contrast(k, im, (0.85, 1.15)), image, 0.6)
    image = _maybe(ks[3], lambda k, im: random_gamma(k, im, (0.85, 1.15)), image, 0.5)
    image = random_gaussian_blur(ks[4], image, (0.0, 0.7), prob=0.15)
    return image, mask


def _rest_classification(key, image, mask):
    ks = jax.random.split(key, 6)
    image, _ = random_scale(ks[0], image, mask, (0.95, 1.05), prob=0.3)
    image = _maybe(ks[1], lambda k, im: random_brightness(k, im, (0.9, 1.1)), image, 0.6)
    image = _maybe(ks[2], lambda k, im: random_contrast(k, im, (0.9, 1.1)), image, 0.6)
    image = _maybe(ks[3], lambda k, im: random_gamma(k, im, (0.9, 1.1)), image, 0.5)
    image = random_gaussian_blur(ks[4], image, (0.0, 0.8), prob=0.15)
    image = random_gaussian_noise(ks[5], image, (0.0, 5.0), prob=0.15)
    return image, mask


def _d4_then(rest):
    """Per-sample tier = uniform D4 geometric stage + photometric/warp rest.

    Key discipline: ``k_geo, k_rest = split(key)``, tid from k_geo — the
    batched path in :func:`augment_batch` replays exactly these draws, so
    batched and per-sample augmentation are bit-identical (pinned in
    tests/test_data.py)."""
    def fn(key, image, mask):
        k_geo, k_rest = jax.random.split(key)
        image, mask = random_d4(k_geo, image, mask)
        return rest(k_rest, image, mask)
    return fn


augment_pair_heavy = _d4_then(_rest_heavy)
augment_pair_heavy.__doc__ = (
    """(``data.py:148-191``) — for datasets <200 tiles.""")
augment_pair_moderate = _d4_then(_rest_moderate)
augment_pair_moderate.__doc__ = (
    """(``data.py:194-232``) — for 100-500-tile datasets (default tier).""")
augment_pair_light = _d4_then(_rest_light)
augment_pair_light.__doc__ = (
    """(``data.py:235-261``) — for >500-tile datasets.""")
augment_pair_tta_style = _d4_then(_rest_tta_style)
augment_pair_tta_style.__doc__ = (
    """(``data.py:264-339``): one of the 8 D4 TTA transforms (systematic) +
    conservative photometrics — training-time mirror of test-time TTA.""")


def augment_grayscale_classification(key, image):
    """Mask-free classifier-tile augmentation (``data.py:342-393``)."""
    k_geo, k_rest = jax.random.split(key)
    dummy = jnp.zeros_like(image)
    image, _ = random_d4(k_geo, image, dummy)
    image, _ = _rest_classification(k_rest, image, dummy)
    return image


def augment_pair_none(key, image, mask):
    """Identity tier (``--augmentation-level none``)."""
    return image, mask


TIERS = {
    "none": augment_pair_none,
    "light": augment_pair_light,
    "moderate": augment_pair_moderate,
    "heavy": augment_pair_heavy,
    "tta_style": augment_pair_tta_style,
    "tta-style": augment_pair_tta_style,  # reference spelling (:1514)
}

# Rest stages for the batched path (the D4 stage runs batch-level).
_REST_TIERS = {
    "light": _rest_light,
    "moderate": _rest_moderate,
    "heavy": _rest_heavy,
    "tta_style": _rest_tta_style,
    "tta-style": _rest_tta_style,
}


def select_tier(n_tiles: int) -> str:
    """Dataset-size-keyed tier choice (``data.py`` docstrings: <200 heavy,
    100-500 moderate, >500 light)."""
    if n_tiles < 200:
        return "heavy"
    if n_tiles <= 500:
        return "moderate"
    return "light"


def _split_batch_keys(key, n):
    """Per-sample (k_geo, k_rest) pairs replaying the per-sample tier fns'
    ``split(key)`` draw — keeps the batched path bit-identical to
    ``vmap(TIERS[tier])``."""
    keys = jax.random.split(key, n)
    sub = jax.vmap(lambda k: jax.random.split(k))(keys)
    return sub[:, 0], sub[:, 1]




def batched_tier(key: jax.Array, images: jax.Array, masks: jax.Array,
                 tier: str, mesh=None):
    """Tier augmentation over a (B, H, W) batch, traceable inside other jits.

    The D4 geometric stage runs batch-level (:func:`apply_transform_batch` —
    one shared transpose instead of vmapped lax.switch rotations, which force
    a 16×-padded batch-minor layout); the photometric/warp rest stage is
    vmapped per sample. Bit-identical to ``vmap(TIERS[tier])`` over split
    keys (tested).

    ``mesh``: pass the active device mesh when the batch is sharded over a
    >1-device 'data' axis — the whole stage then runs per shard under
    shard_map (augmentation is per-sample, so results stay bit-identical:
    the per-sample keys/ids are drawn globally and sharded in).
    """
    if tier == "none":
        return images, masks
    rest = _REST_TIERS[tier]  # unknown tiers raise, like TIERS[tier] did
    geo_keys, rest_keys = _split_batch_keys(key, images.shape[0])
    tids = jax.vmap(lambda k: jax.random.randint(k, (), 0, 8))(geo_keys)

    def stage(imgs, msks, tids_l, rest_l):
        imgs = apply_transform_batch(imgs, tids_l)
        msks = apply_transform_batch(msks, tids_l)
        return jax.vmap(rest)(rest_l, imgs, msks)

    from adipose_tpu.ops.normalize import mesh_needs_pershard, shard_map_unchecked

    if mesh_needs_pershard(mesh, images.shape[0]):
        from jax.sharding import PartitionSpec as P

        arr = P("data", None, None)
        stage = shard_map_unchecked(stage, mesh=mesh,
                                    in_specs=(arr, arr, P("data"), P("data")),
                                    out_specs=(arr, arr))
    return stage(images, masks, tids, rest_keys)


@partial(jax.jit, static_argnames=("tier",))
def augment_batch(key: jax.Array, images: jax.Array, masks: jax.Array,
                  tier: str = "moderate"):
    """Tier augmentation over a (B, H, W) batch — one device program."""
    return batched_tier(key, images, masks, tier)


def _classification_stage(images, tids, rest_keys, mesh=None):
    """Shared classifier-aug core over per-sample (tid, rest-key) draws."""
    def stage(imgs, tids_l, rest_l):
        imgs = apply_transform_batch(imgs, tids_l)
        out, _ = jax.vmap(_rest_classification)(rest_l, imgs,
                                                jnp.zeros_like(imgs))
        return out

    from adipose_tpu.ops.normalize import mesh_needs_pershard, shard_map_unchecked

    if mesh_needs_pershard(mesh, images.shape[0]):
        from jax.sharding import PartitionSpec as P

        stage = shard_map_unchecked(
            stage, mesh=mesh,
            in_specs=(P("data", None, None), P("data"), P("data")),
            out_specs=P("data", None, None))
    return stage(images, tids, rest_keys)


def batched_classification(key: jax.Array, images: jax.Array, mesh=None):
    """Batched classifier-tile augmentation, traceable inside other jits.
    ``mesh`` as in :func:`batched_tier`."""
    geo_keys, rest_keys = _split_batch_keys(key, images.shape[0])
    tids = jax.vmap(lambda k: jax.random.randint(k, (), 0, 8))(geo_keys)
    return _classification_stage(images, tids, rest_keys, mesh=mesh)


def batched_classification_grouped(keys: jax.Array, images: jax.Array,
                                   mesh=None):
    """K stacked train-batches augmented in ONE stage: ``keys`` is (K, 2)
    legacy PRNG keys, ``images`` is (K·B, H, W) — per-sample draws are
    bit-identical to K separate :func:`batched_classification`
    ``(keys[k], images[kB:(k+1)B])`` calls (pinned in tests/test_data.py).
    The classifier trainer megabatches its prep program through this to
    amortize axon dispatch latency over K train steps (BASELINE.md r4)."""
    K = keys.shape[0]
    B = images.shape[0] // K
    assert K * B == images.shape[0], (keys.shape, images.shape)
    geo_keys, rest_keys = jax.vmap(_split_batch_keys, in_axes=(0, None))(keys, B)
    geo_keys = geo_keys.reshape(K * B, *geo_keys.shape[2:])
    rest_keys = rest_keys.reshape(K * B, *rest_keys.shape[2:])
    tids = jax.vmap(lambda k: jax.random.randint(k, (), 0, 8))(geo_keys)
    return _classification_stage(images, tids, rest_keys, mesh=mesh)


@jax.jit
def augment_classification_batch(key: jax.Array, images: jax.Array):
    return batched_classification(key, images)
