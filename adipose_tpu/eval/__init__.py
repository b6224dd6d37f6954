from adipose_tpu.eval import boundary, bootstrap, evaluator, sliding_window, threshold, tta
from adipose_tpu.eval.evaluator import PublicationEvaluator

__all__ = [
    "boundary",
    "bootstrap",
    "evaluator",
    "sliding_window",
    "threshold",
    "tta",
    "PublicationEvaluator",
]
