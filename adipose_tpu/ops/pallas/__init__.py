from adipose_tpu.ops.pallas.preprocess import (
    fused_zscore_normalize,
    histogram_u8,
    percentile_normalize_u8,
)

__all__ = ["fused_zscore_normalize", "histogram_u8", "percentile_normalize_u8"]
