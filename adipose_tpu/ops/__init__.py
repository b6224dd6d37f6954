from adipose_tpu.ops import (
    blend,
    clahe,
    color,
    d4,
    fftops,
    losses,
    metrics,
    morphology,
    normalize,
    qc,
    stain,
)

__all__ = [
    "blend",
    "clahe",
    "color",
    "d4",
    "fftops",
    "losses",
    "metrics",
    "morphology",
    "normalize",
    "qc",
    "stain",
]
