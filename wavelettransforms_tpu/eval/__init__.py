from .harness import (EvalResult, evaluate_all, evaluate_checkpoint_dir,
                      evaluate_model, read_metrics_file, write_metrics_file)
from .metrics import (classification_metrics, confusion_matrix,
                      model_sparsity, per_layer_zero_census)

__all__ = [
    "EvalResult", "evaluate_all", "evaluate_checkpoint_dir", "evaluate_model",
    "read_metrics_file", "write_metrics_file", "classification_metrics",
    "confusion_matrix", "model_sparsity", "per_layer_zero_census",
]
