from . import metrics
from .evaluator import Evaluator

__all__ = ["metrics", "Evaluator"]
