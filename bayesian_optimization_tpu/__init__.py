"""TPU-native Bayesian-optimization framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capability surface of `bayes_optim`
(wangronin/Bayesian-Optimization) for TPU hardware: mixed search spaces
compiled to masked continuous embeddings, a batched Gaussian-process engine
with vectorized hyperparameter inference, acquisition maximization as sharded
particle populations, and ask/evaluate/tell BO loops on top.
"""
__version__ = "0.1.0"

import os as _os


_cache_enabled_by_us = False


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default where it is safe.

    BO loops re-enter the same jitted fit/argmax programs across process
    lifetimes, so a disk cache saves the cold compiles. Users override via
    the standard JAX env vars/config (JAX_COMPILATION_CACHE_DIR wins;
    BOTPU_NO_COMPILE_CACHE=1 disables; BOTPU_COMPILE_CACHE=1 forces on).

    Measured exception: under the remote-compile TPU plugin ("axon",
    PJRT compiles proxied over a tunnel) the cache is actively harmful —
    writing multi-MB executables through the tunnel multiplies cold-compile
    wall-clock ~4x, and executables *deserialized* from the cache hang at
    first execution (reproduced with a 30-iteration Cholesky fori_loop:
    cold process 3.7 s, warm-cache process never returns). Skip it there
    unless explicitly forced.
    """
    if _os.environ.get("BOTPU_NO_COMPILE_CACHE"):
        return
    remote_tpu = "axon" in _os.environ.get("JAX_PLATFORMS", "") or _os.environ.get(
        "PALLAS_AXON_REMOTE_COMPILE"
    )
    if remote_tpu and not _os.environ.get("BOTPU_COMPILE_CACHE"):
        return
    global _cache_enabled_by_us
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache", "bo_tpu_xla"),
            )
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            _cache_enabled_by_us = True
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass


_enable_persistent_compile_cache()

_cache_safety_checked = False


def _ensure_cache_safe_for_backend() -> None:
    """Lazy second line of defense for the remote-compile hang: the env-var
    check above runs at import, before JAX resolves a backend, so a remote
    'axon' plugin activated by any OTHER mechanism would still get the
    default-on cache (and hang at first cached-executable execution). Called
    on the first model fit — by then the backend is resolved and cheap to
    inspect — and turns the cache off if it turns out to be remote-axon."""
    global _cache_safety_checked
    if _cache_safety_checked:
        return
    _cache_safety_checked = True
    if _os.environ.get("BOTPU_COMPILE_CACHE"):
        return  # explicitly forced on
    try:
        import jax

        # the axon plugin registers its backend under platform name "tpu",
        # so default_backend() never says "axon" — the plugin identity
        # lives in the PJRT client's platform_version string
        # (e.g. "PJRT C API\naxon 0.1.0; ...")
        if not _cache_enabled_by_us:
            return  # never touch a cache the user configured themselves
        dev = jax.devices()[0]
        version = str(getattr(dev.client, "platform_version", "")).lower()
        if "axon" in version and jax.config.jax_compilation_cache_dir is not None:
            jax.config.update("jax_compilation_cache_dir", None)
    except Exception:  # noqa: BLE001 - diagnostics must never break fits
        pass


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
