"""ctypes bindings for the native tileops library (native/tileops.cpp).

The C++ library accelerates the host-side data plane (rasterization, tile
gather, 16→8-bit conversion, blend accumulation, QC prefilter stats); every
binding has a pure-Python/numpy fallback so the framework works without the
compiled artifact. Build with ``native/build.sh`` (g++ -O3 -fopenmp); the
library auto-builds on first use when a compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtileops.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        build = _NATIVE_DIR / "build.sh"
        if build.exists():
            try:
                subprocess.run(["bash", str(build)], capture_output=True,
                               timeout=120, check=True)
            except Exception:
                return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fill_polygons.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p, i32p,
                                  ctypes.c_int, ctypes.c_uint8]
    lib.convert_u16_to_u8.argtypes = [u16p, u8p, ctypes.c_int64]
    lib.extract_tiles_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p,
                                     ctypes.c_int, ctypes.c_int, u8p]
    lib.blend_accumulate_f32.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                         f32p, f32p, ctypes.c_int, ctypes.c_int,
                                         i32p]
    lib.tile_stats_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float, f32p, f32p, f32p]
    lib.tileops_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def fill_polygons(polygons, height: int, width: int, value: int = 1) -> np.ndarray:
    """Rasterize polygons → (H, W) uint8 mask. Native scanline fill when the
    library is present, cv2.fillPoly otherwise."""
    lib = _load()
    polys = [np.ascontiguousarray(p, dtype=np.int32) for p in polygons if len(p) >= 3]
    if lib is None:
        import cv2

        mask = np.zeros((height, width), np.uint8)
        if polys:
            cv2.fillPoly(mask, [p.reshape(-1, 1, 2) for p in polys], value)
        return mask
    mask = np.zeros((height, width), np.uint8)
    if not polys:
        return mask
    pts = np.concatenate([p.reshape(-1, 2) for p in polys]).astype(np.int32)
    offsets = np.zeros(len(polys) + 1, np.int32)
    np.cumsum([len(p) for p in polys], out=offsets[1:])
    lib.fill_polygons(
        _ptr(mask, ctypes.c_uint8), height, width,
        _ptr(np.ascontiguousarray(pts), ctypes.c_int32),
        _ptr(offsets, ctypes.c_int32), len(polys), value,
    )
    return mask


def convert_u16_to_u8(img: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(img, dtype=np.uint16)
    if lib is None:
        lo, hi = int(src.min()), int(src.max())
        if hi == lo:
            return np.zeros_like(src, dtype=np.uint8)
        return ((src.astype(np.float32) - lo) / (hi - lo) * 255).astype(np.uint8)
    out = np.empty(src.shape, np.uint8)
    lib.convert_u16_to_u8(_ptr(src, ctypes.c_uint16), _ptr(out, ctypes.c_uint8),
                          src.size)
    return out


def extract_tiles(image: np.ndarray, positions: np.ndarray, tile: int) -> np.ndarray:
    """(N, T, T) uint8 gather from an (H, W) uint8 image."""
    lib = _load()
    img = np.ascontiguousarray(image, dtype=np.uint8)
    pos = np.ascontiguousarray(positions, dtype=np.int32)
    n = len(pos)
    if lib is None:
        return np.stack([img[y : y + tile, x : x + tile] for y, x in pos]) \
            if n else np.empty((0, tile, tile), np.uint8)
    out = np.empty((n, tile, tile), np.uint8)
    if n:
        lib.extract_tiles_u8(_ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
                             _ptr(pos, ctypes.c_int32), n, tile,
                             _ptr(out, ctypes.c_uint8))
    return out


def blend_accumulate(acc: np.ndarray, wsum: np.ndarray, tiles: np.ndarray,
                     weight: np.ndarray, positions: np.ndarray) -> None:
    """In-place weighted scatter-add (host fallback blend path)."""
    lib = _load()
    pos = np.ascontiguousarray(positions, dtype=np.int32)
    t = tiles.shape[-1]
    if lib is None:
        for tile, (y, x) in zip(tiles, pos):
            acc[y : y + t, x : x + t] += tile * weight
            wsum[y : y + t, x : x + t] += weight
        return
    lib.blend_accumulate_f32(
        _ptr(acc, ctypes.c_float), _ptr(wsum, ctypes.c_float),
        acc.shape[0], acc.shape[1],
        _ptr(np.ascontiguousarray(tiles, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(weight, np.float32), ctypes.c_float),
        len(pos), t, _ptr(pos, ctypes.c_int32),
    )


def tile_stats(tiles: np.ndarray, white_threshold: float = 235.0):
    """(white_ratio, mean, var) per tile — host QC prefilter."""
    lib = _load()
    batch = np.ascontiguousarray(tiles, dtype=np.uint8)
    n = batch.shape[0]
    if lib is None:
        f = batch.astype(np.float32).reshape(n, -1)
        return ((f >= white_threshold).mean(1), f.mean(1), f.var(1))
    wr = np.empty(n, np.float32)
    mean = np.empty(n, np.float32)
    var = np.empty(n, np.float32)
    if n:
        lib.tile_stats_u8(_ptr(batch, ctypes.c_uint8), n, batch.shape[-1],
                          white_threshold, _ptr(wr, ctypes.c_float),
                          _ptr(mean, ctypes.c_float), _ptr(var, ctypes.c_float))
    return wr, mean, var
