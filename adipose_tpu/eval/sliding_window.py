"""Sliding-window inference — device-resident tiles, batched prediction, fused
blend.

Behavioral spec: ``SlidingWindowInference``
(``full_evaluation_enhanced.py:233-329``): overlap ≤ 0.75, stride
tile·(1−overlap), bounds-clamped positions, per-tile prediction (± TTA),
Gaussian/linear/none blending.

TPU-native: the reference predicts tiles one at a time on host; here the whole
image lives on device, tiles are gathered with dynamic slices, predicted in
batches (padded to a static batch size to keep one compiled program), and
scatter-add blended — no host round-trips.

Images smaller than the tile are reflect-padded up to tile size and the result
is cropped back (the reference silently produces zero tiles for this case —
see SURVEY.md §4 'do better').
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from adipose_tpu.ops.blend import (
    blend_tiles,
    extract_tiles,
    gaussian_weight_map,
    sliding_window_positions,
)


class SlidingWindowInference:
    def __init__(
        self,
        tile_size: int = 1024,
        overlap: float = 0.5,
        blend_mode: str = "gaussian",
        batch_size: int = 8,
        sigma_factor: float = 0.25,
        mesh=None,
        transfer_dtype: str = "float32",  # 'float16' halves the map download
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — when given, each predict
        batch is sharded over the mesh's 'data' axis, so one WSI's tile stream
        spreads across all chips (the spatial analog of context parallelism:
        data-parallel over space, halo-free because tiles overlap —
        SURVEY.md §5 long-context)."""
        self.tile_size = tile_size
        self.overlap = max(0.0, min(overlap, 0.75))
        self.stride = int(tile_size * (1 - self.overlap))
        self.blend_mode = blend_mode
        self.mesh = mesh
        self.transfer_dtype = transfer_dtype
        if mesh is not None:
            n = mesh.shape.get("data", 1)
            batch_size = max(batch_size, n) // n * n  # divisible by data axis
        self.batch_size = batch_size
        if blend_mode == "gaussian":
            self.weight_map = gaussian_weight_map(tile_size, sigma_factor)
        else:  # 'linear' and 'none' both average; 'none' has full-overlap=1 map
            self.weight_map = jnp.ones((tile_size, tile_size), jnp.float32)

    def predict(self, predict_fn, params, image) -> np.ndarray:
        """Full-image probability map.

        ``predict_fn(params, tiles(B,T,T)) -> (B,T,T)`` — normalization is the
        caller's business (typically already folded into predict_fn).
        """
        # native-dtype upload (a u8 slide ships 4× fewer bytes), cast on device
        image = jnp.asarray(image).astype(jnp.float32)
        h, w = image.shape
        t = self.tile_size
        pad_h, pad_w = max(0, t - h), max(0, t - w)
        if pad_h or pad_w:
            image = jnp.pad(image, ((0, pad_h), (0, pad_w)), mode="reflect")
        ph, pw = image.shape

        positions = sliding_window_positions((ph, pw), t, self.overlap)
        tiles = extract_tiles(image, jnp.asarray(positions), t)

        preds = []
        b = self.batch_size
        for i in range(0, tiles.shape[0], b):
            chunk = tiles[i : i + b]
            n = chunk.shape[0]
            if n < b:  # pad to static batch for one compiled program
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], b - n, axis=0)], axis=0
                )
            if self.mesh is not None:
                from adipose_tpu.parallel.mesh import data_sharding

                chunk = jax.device_put(chunk, data_sharding(self.mesh, 3))
            preds.append(predict_fn(params, chunk)[:n])
        preds = jnp.concatenate(preds, axis=0)

        full = blend_tiles(preds, jnp.asarray(positions), self.weight_map, ph, pw)
        if self.transfer_dtype == "float16":
            full = full.astype(jnp.float16)
        return np.asarray(full[:h, :w], dtype=np.float32)
