"""Micro-benchmark: Pallas fused kernel-matrix vs the XLA matmul path on
the real TPU. Run manually; prints both timings."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main(n=1024, d=8, iters=50):
    from bayesian_optimization_tpu.models.kernels import matern
    from bayesian_optimization_tpu.ops.pallas_kernels import matern_pallas

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    theta = jnp.asarray(rng.uniform(0.1, 2.0, d), jnp.float32)

    xla = jax.jit(lambda t, x: matern(t, x, nu=1.5))
    pls = jax.jit(lambda t, x: matern_pallas(t, x, nu=1.5))

    for name, fn in [("xla", xla), ("pallas", pls)]:
        out = fn(theta, X)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(theta, X)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms per (n={n}, d={d}) kernel matrix")
    print("max|diff|:", float(jnp.max(jnp.abs(xla(theta, X) - pls(theta, X)))))


def main_whiten(n=1024, m=2, iters=20):
    """Fused factor+solve kernel vs the blocked XLA path (factor + forward
    substitution). The fused kernel is ONE launch; the XLA path is a
    ~n-deep chain of column ops — on the remote tunnel the difference shows
    up as per-call latency, on-device as sequential small-op overhead."""
    from bayesian_optimization_tpu.ops.linalg import _factor, tri_solve_lower
    from bayesian_optimization_tpu.ops.pallas_kernels import whiten_fused

    rng = np.random.default_rng(0)
    Z = rng.uniform(0, 1, (n, 4))
    D2 = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    R = jnp.asarray(np.exp(-5 * D2) + 1e-4 * np.eye(n), jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)

    @jax.jit
    def xla_path(R, B):
        with jax.default_matmul_precision("high"):
            L, Dinv, piv = _factor(R)
            return jnp.diagonal(L), tri_solve_lower(L, Dinv, B), piv

    pls = jax.jit(lambda R, B: whiten_fused(R, B)[:3])
    for name, fn in [("xla factor+solve", xla_path), ("pallas whiten_fused", pls)]:
        out = fn(R, B)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(R, B)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms per (n={n}) factor+solve")
    d0, W0, _ = xla_path(R, B)
    d1, W1, _ = pls(R, B)
    # at this conditioning (nugget 1e-4) the XLA "high"-precision path can
    # go NaN (caught by the likelihood's pivot penalty in real fits) while
    # the full-precision Pallas kernel stays finite — report both
    print("xla finite:", bool(jnp.all(jnp.isfinite(W0))),
          "| pallas finite:", bool(jnp.all(jnp.isfinite(W1))))
    print("max|dW| (nan => the XLA side diverged):",
          float(jnp.max(jnp.abs(W0 - W1))))


if __name__ == "__main__":
    main()
    if jax.default_backend() == "tpu":
        main_whiten()
