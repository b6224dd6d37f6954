from adipose_tpu.core.seeding import get_project_seed, load_seed, key_for
from adipose_tpu.core.config import (
    UNetConfig,
    ClassifierConfig,
    TrainConfig,
    EvalConfig,
    DataBuildConfig,
)

__all__ = [
    "get_project_seed",
    "load_seed",
    "key_for",
    "UNetConfig",
    "ClassifierConfig",
    "TrainConfig",
    "EvalConfig",
    "DataBuildConfig",
]
