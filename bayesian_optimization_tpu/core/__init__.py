"""BO engine core: data model, ask/evaluate/tell loops, BO flavors."""
from .solution import Solution
from .base import BaseBO, BaseOptimizer
from .bo import BO, AnnealingBO, NoisyBO, ParallelBO, SelfAdaptiveBO

__all__ = [
    "Solution", "BaseOptimizer", "BaseBO",
    "BO", "ParallelBO", "AnnealingBO", "SelfAdaptiveBO", "NoisyBO",
]
