"""Test configuration: run everything on a simulated 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: in this environment the axon TPU plugin ignores the `JAX_PLATFORMS`
env var; `JAX_PLATFORM_NAME` and `jax.config.update("jax_platforms", ...)`
do work — use those.
"""
import os
import resource

# XLA:CPU's LLVM compile of the big fused programs (the multi-stage MLE
# ladder) intermittently segfaults mid-suite in this environment — the
# faulting frame is always backend_compile_and_load on a fresh (uncached)
# compile. glibc sizes NEW pthread stacks from the soft RLIMIT_STACK, so
# raise it to 64 MB BEFORE jax (and its compile thread pool) starts:
# deep LLVM pass recursion then has headroom. Must precede `import jax`.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 64 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _cap = _hard if _hard != resource.RLIM_INFINITY else _want
        resource.setrlimit(resource.RLIMIT_STACK, (min(_want, _cap), _hard))
except (ValueError, OSError):  # pragma: no cover - restricted environments
    pass

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# the suite is pinned to CPU below, where the persistent compile cache is
# safe and saves minutes of recompiles; the package skips it by default
# under the remote-compile TPU plugin (see bayesian_optimization_tpu/__init__)
os.environ.setdefault("BOTPU_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
