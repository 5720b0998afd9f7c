"""Multi-device sharding: populations across the 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend
from bayesian_optimization_tpu.parallel import (
    PARTICLE_AXIS, make_particle_mesh, particle_sharding, shard_population,
)


def test_mesh_has_8_devices():
    mesh = make_particle_mesh()
    assert mesh.devices.size == 8


def test_shard_population_pads_and_places():
    mesh = make_particle_mesh()
    x = jnp.arange(20.0).reshape(10, 2)
    xs = shard_population(x, mesh)
    assert xs.shape == (16, 2)  # padded to a multiple of 8
    assert xs.sharding.spec[0] == PARTICLE_AXIS
    assert np.allclose(np.asarray(xs)[:10], np.asarray(x))


def test_sharded_reduction_matches_single_device():
    mesh = make_particle_mesh()
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 4))
    f = jax.jit(lambda a: jnp.argmin(jnp.sum(a**2, axis=1)))
    single = int(f(x))
    sharded = int(f(jax.device_put(x, particle_sharding(mesh))))
    assert single == sharded


def test_bo_with_mesh_runs_and_matches_types():
    mesh = make_particle_mesh()
    gp = GaussianProcess(
        mean=constant_trend(2), corr="matern",
        thetaL=1e-3 * np.ones(2), thetaU=1e3 * np.ones(2),
        nugget=1e-6, random_start=8, max_iter=25, random_state=0,
    )
    opt = BO(
        search_space=RealSpace([[-5, 5]] * 2, random_seed=0),
        obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        model=gp, DoE_size=5, max_FEs=10, random_seed=0, mesh=mesh,
    )
    xopt, fopt, _ = opt.run()
    assert opt.eval_count == 10
    assert fopt[0] < 10.0


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_sharded_cma_argmax_loop_has_no_collectives():
    """The generation loop of the population-CMA argmax must stay
    communication-free under GSPMD: the only collective allowed is the final
    best-of-population reduce at the top level. An unpartitionable op in the
    predict path (e.g. a triangular-solve custom-call) silently reintroduces
    an all-gather per generation and inverts multi-chip scaling."""
    import jax.numpy as jnp

    from bayesian_optimization_tpu.optim import argmax as am
    from bayesian_optimization_tpu.parallel.mesh import (
        make_particle_mesh, replicated, shard_population,
    )

    D, N = 3, 64
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (N, D))
    y = np.sin(3 * X).sum(1)
    gp = GaussianProcess(
        mean=constant_trend(D), corr="matern",
        thetaL=1e-3 * np.ones(D), thetaU=1e3 * np.ones(D),
        nugget=1e-6, random_start=4, max_iter=15, random_state=0,
    )
    gp.fit(X, (y - y.mean()) / y.std())
    mesh = make_particle_mesh()
    enc = RealSpace([[0.0, 1.0]] * D).encoding()
    key = jax.random.PRNGKey(0)
    x0 = shard_population(jax.random.uniform(key, (256, D), jnp.float32), mesh)
    state = jax.device_put(gp.posterior, replicated(mesh))
    params = {"plugin": jnp.asarray(-1.0, jnp.float32)}
    txt = am._cma_argmax.lower(
        key, state, gp.config, enc, "EI", params, True,
        x0, jnp.zeros(D), jnp.zeros(D), 16,
    ).compile().as_text()
    # Partition the HLO module into computations by brace tracking (robust
    # to label renames, unlike substring heuristics): every collective must
    # live in the ENTRY computation (the final best-of-population reduce);
    # any collective inside a sub-computation — in particular the while
    # body of the generation loop — is a regression.
    COLLECTIVES = (
        "all-gather", "all-reduce(", "all-reduce-start", "all-to-all",
        "collective-permute", "reduce-scatter",
    )
    in_entry, depth = False, 0
    offenders, total, in_entry_count = [], 0, 0
    for line in txt.splitlines():
        stripped = line.strip()
        if depth == 0 and "{" in line:
            in_entry = stripped.startswith("ENTRY")
        depth += line.count("{") - line.count("}")
        if any(c in line for c in COLLECTIVES):
            total += 1
            if in_entry:
                in_entry_count += 1
            else:
                offenders.append(stripped[:100])
    assert not offenders, f"collectives outside ENTRY (e.g. in the generation loop): {offenders}"
    # sanity: the lowering was actually partitioned — the final reduce must
    # exist, otherwise the assertion above passes vacuously
    assert total >= 1 and total == in_entry_count, (total, in_entry_count)
