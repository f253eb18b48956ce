"""Observability utilities: solve_breakdown phase timings, distribution_path.

Covers the two diagnostics flagged untested in the round-2 review: the
per-phase solver breakdown (`utils/profiling.solve_breakdown`) and the full
distribution path (`blocks/forward.distribution_path`, the counterpart of the
reference driver's plotting data, `RunMain.jl:57-60`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.blocks.backward import backward_iteration
from hank_tpu.blocks.forward import distribution_path, forward_iteration
from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian
from hank_tpu.utils.profiling import solve_breakdown


@pytest.fixture(scope="module")
def setup(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    T = model.compspec.T
    t = jnp.arange(1, T, dtype=jnp.float64)
    exog = {"Z": 1.0 + 0.1 * 0.8 ** t}
    x0 = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), T - 1)
    return model, ss, exog, x0


def test_solve_breakdown_phases(setup, ks_small_ss):
    model, ss, exog, _ = setup
    Jbar = get_steady_state_jacobian(ss, model)
    out = solve_breakdown(model, ss, ss, Jbar, exog, iters=1)
    expected = {"residual_F_seconds", "jvp_sweep_seconds",
                "precond_solve_seconds", "backward_scan_seconds",
                "forward_scan_seconds"}
    assert set(out) == expected
    for k, v in out.items():
        assert np.isfinite(v) and v > 0.0, (k, v)


def test_solve_breakdown_mixed_precision(setup):
    """direction_dtype times the JVP sweep through the cast-f32 pipeline."""
    model, ss, exog, _ = setup
    Jbar = get_steady_state_jacobian(ss, model)
    out = solve_breakdown(model, ss, ss, Jbar, exog,
                          direction_dtype=jnp.float32, iters=1)
    assert np.isfinite(out["jvp_sweep_seconds"]) and out["jvp_sweep_seconds"] > 0


def test_distribution_path_evolution(setup):
    """D path: starts at D_initial, conserves mass, stays non-negative, and
    its aggregates reproduce forward_iteration's (same scan, kept states)."""
    model, ss, exog, x0 = setup
    policies = backward_iteration(x0, exog, model, ss.vars, ss.value)
    Ds = distribution_path(policies, model, ss.D)

    Tm1 = model.compspec.T - 1
    assert Ds.shape == (Tm1 + 1, *ss.D.shape)
    assert float(jnp.max(jnp.abs(Ds[0] - ss.D))) == 0.0
    sums = np.asarray(jnp.sum(Ds, axis=tuple(range(1, Ds.ndim))))
    np.testing.assert_allclose(sums, 1.0, atol=1e-12)
    assert float(jnp.min(Ds)) >= -1e-15

    aggs = forward_iteration(policies, model, ss.D)
    het = model.vars_of_type("heterogeneous")[0]
    # aggregate at t = sum(policy_t * D_{t+1}) per forward_iteration's step
    recomputed = jnp.sum(policies[het] * Ds[1:],
                         axis=tuple(range(1, Ds.ndim)))
    np.testing.assert_allclose(np.asarray(aggs[het]), np.asarray(recomputed),
                               rtol=1e-12, atol=1e-13)
