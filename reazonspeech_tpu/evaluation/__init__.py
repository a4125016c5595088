"""reazonspeech_tpu.evaluation — CER evaluation harness over HF datasets.

Contract parity with the reference package ``reazonspeech.evaluation``
(pkg/evaluation/src/__init__.py): BaseEvaluator + CER utilities, process-level
data parallelism via datasets.map.
"""

from .base import BaseEvaluator, EvaluationResult, EvaluationResultBatch
from .mesh import mesh_model
from .utils import CERResult, calculate_cer, normalize

__all__ = [
    "BaseEvaluator",
    "EvaluationResult",
    "EvaluationResultBatch",
    "CERResult",
    "calculate_cer",
    "normalize",
    "mesh_model",
]
