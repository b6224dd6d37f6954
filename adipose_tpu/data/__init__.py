from adipose_tpu.data import augment, loader, tiling, rasterize, stats

__all__ = ["augment", "loader", "tiling", "rasterize", "stats"]
