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


if __name__ == "__main__":
    main()
