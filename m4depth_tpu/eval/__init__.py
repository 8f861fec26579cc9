from m4depth_tpu.eval.evaluator import (
    evaluate_streaming,
    evaluate_windowed,
    evaluate,
    metrics_to_validation_perfs,
    write_perfs,
)

__all__ = [
    "evaluate_streaming",
    "evaluate_windowed",
    "evaluate",
    "metrics_to_validation_perfs",
    "write_perfs",
]
