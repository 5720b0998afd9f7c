"""TPU-native Bayesian-optimization framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capability surface of `bayes_optim`
(wangronin/Bayesian-Optimization) for TPU hardware: mixed search spaces
compiled to masked continuous embeddings, a batched Gaussian-process engine
with vectorized hyperparameter inference, acquisition maximization as sharded
particle populations, and ask/evaluate/tell BO loops on top.
"""
__version__ = "0.1.0"

from .space import (
    Bool, BoolSpace, Discrete, DiscreteSpace, Integer, IntegerSpace, Node,
    Ordinal, OrdinalSpace, Real, RealSpace, SearchSpace, SpaceEncoding, Subset,
    SubsetSpace, Variable,
)
from .utils import (
    AskEmptyError, ConstraintEvaluationError, FlatFitnessError,
    ObjectiveEvaluationError, RecommendationUnavailableError,
)
from .core import (
    BO, AnnealingBO, BaseBO, BaseOptimizer, ConditionalBO, MOBO, MOBO_qEHVI,
    MultiAcquisitionBO, NoisyBO, ParallelBO, PCABO, SelfAdaptiveBO, Solution,
)
from .models import GaussianProcess
from .models import trend
from .models.random_forest import RandomForest, SurrogateAggregation
from .ops.acquisition import EI, GEI, MGFI, PI, UCB, EpsilonPI
from .fmin import fmin

__all__ = [
    "__version__", "fmin",
    "Variable", "Real", "Integer", "Ordinal", "Discrete", "Bool", "Subset",
    "SearchSpace", "RealSpace", "IntegerSpace", "OrdinalSpace", "DiscreteSpace",
    "BoolSpace", "SubsetSpace", "Node", "SpaceEncoding",
    "Solution", "BaseOptimizer", "BaseBO",
    "BO", "ParallelBO", "AnnealingBO", "SelfAdaptiveBO", "NoisyBO",
    "MultiAcquisitionBO", "MOBO", "MOBO_qEHVI", "PCABO", "ConditionalBO",
    "GaussianProcess", "RandomForest", "SurrogateAggregation", "trend",
    "EI", "PI", "EpsilonPI", "UCB", "MGFI", "GEI",
    "AskEmptyError", "FlatFitnessError", "RecommendationUnavailableError",
    "ObjectiveEvaluationError", "ConstraintEvaluationError",
]
