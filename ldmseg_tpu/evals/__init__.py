from .vpq import vpq_eval_np, vpq_eval_device, vpq_stats_to_scores
from .miou import SemsegMeter
from .pq import PanopticEvaluator
from .dvpq import dvpq_windows, evaluate_dvpq

__all__ = [
    "vpq_eval_np",
    "vpq_eval_device",
    "vpq_stats_to_scores",
    "SemsegMeter",
    "PanopticEvaluator",
    "dvpq_windows",
    "evaluate_dvpq",
]
