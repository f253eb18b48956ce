"""One-asset HANK (monetary shock): the lead-bearing model family.

This model has max_lag = 1 (Fisher: i(-1)) AND max_lead = 1 (forward-looking
Taylor: pi(+1)) — the configuration whose Jacobian boundary behavior the
reference leaves unverified (`SteadyStateJacobian.jl:344-384`). The dense
ground-truth comparison here closes that gap.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.models import load_model
from tests.conftest import solve_ss_cached


def build_small_hank(T=12, n_b=30, n_e=4):
    from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
    from hank_tpu.model.structures import HeterogeneityDimension

    model = load_model("hank_one_asset", T=T)
    bonds = HeterogeneityDimension(
        name="bonds", dim_type="endogenous", n=n_b,
        grid=jnp.asarray(make_double_exponential_grid(0.0, 150.0, n_b)),
        transition=None, policy_var="B")
    Pi, _, z = rouwenhorst(n_e, 0.966, 0.283)
    income = HeterogeneityDimension(
        name="income", dim_type="exogenous", n=n_e,
        grid=jnp.asarray(z), transition=jnp.asarray(Pi), policy_var=None)
    return dataclasses.replace(
        model, heterogeneity={"bonds": bonds, "income": income})


@pytest.fixture(scope="module")
def hank_small():
    return build_small_hank()


@pytest.fixture(scope="module")
def hank_ss(hank_small):
    return solve_ss_cached(hank_small)


def test_model_structure(hank_small):
    cs = hank_small.compspec
    assert cs.max_lag == 1 and cs.max_lead == 1
    assert hank_small.vars_of_type("endogenous") == ("pi", "i", "r")
    assert hank_small.vars_of_type("heterogeneous") == ("B", "C")


def test_hank_ss_economics(hank_small, hank_ss):
    model, ss = hank_small, hank_ss
    pi, i, r, B, C = (float(ss.vars[k]) for k in ("pi", "i", "r", "B", "C"))
    p = model.params
    # Taylor (at SS pi(+1) = pi), Fisher, bond clearing, Walras.
    assert abs(i - p["rstar"] - p["phi_pi"] * pi) < 1e-8
    assert abs((1 + r) * (1 + pi) - (1 + i)) < 1e-8
    assert abs(B - p["Bbar"]) < 1e-8
    assert abs(C - 1.0) < 1e-9           # goods clearing by Walras


def test_hank_pipeline_consistency(hank_small, hank_ss):
    from hank_tpu.solvers.steady_state import single_run

    model, ss = hank_small, hank_ss
    Tm1 = model.compspec.T - 1
    exog = {"Y": jnp.ones(Tm1), "eps_m": jnp.zeros(Tm1)}
    res = single_run(ss, ss, model, exog)
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_hank_jacobian_with_lead_matches_dense(hank_small, hank_ss):
    """Toeplitz assembly vs dense jacfwd for a model with max_lead = 1 —
    settles the reference's open lead-boundary question."""
    from hank_tpu.solvers.ss_jacobian import (
        dense_path_jacobian,
        get_steady_state_jacobian,
    )

    J_toep = np.asarray(get_steady_state_jacobian(hank_ss, hank_small))
    J_dense = np.asarray(dense_path_jacobian(hank_ss, hank_ss, hank_small))
    diff = np.abs(J_toep - J_dense)
    assert diff.max() < 1e-8, f"max diff {diff.max():.3e}"


def test_hank_monetary_shock_path(hank_small, hank_ss):
    """Expansionary shock: nominal rate falls, inflation rises on impact."""
    from hank_tpu.solvers.newton import newton_raphson_hank
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss = hank_small, hank_ss
    T = model.compspec.T
    Tm1 = T - 1
    t = jnp.arange(1, T, dtype=jnp.float64)
    exog = {"Y": jnp.ones(Tm1), "eps_m": -0.002 * 0.6 ** t}
    x0 = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), Tm1)
    J = get_steady_state_jacobian(ss, model)
    x, info = newton_raphson_hank(x0, J, exog, model, ss, ss,
                                  method="newton_krylov", eps=1e-9)
    assert float(info["residual_norm"]) < 1e-9
    path = np.asarray(x).reshape(Tm1, 3)
    names = model.vars_of_type("endogenous")
    r_path = path[:, names.index("r")]
    pi_path = path[:, names.index("pi")]
    pi_dev = pi_path - float(ss.vars["pi"])
    # Endowment-economy logic: bond clearing pins the real-rate path at its
    # SS value (household demand is a function of {r_t, Y} only), while
    # π_1 is pinned by the lagged nominal rate — the nominal side absorbs
    # the shock from t = 2 via Taylor + Fisher: π_2 − π_ss ≈ ε_1/((1+r)−φπ).
    assert np.max(np.abs(r_path - float(ss.vars["r"]))) < 1e-6
    assert abs(pi_dev[0]) < 1e-6                       # impact π pinned
    eps1 = -0.002 * 0.6
    predicted = eps1 / ((1 + float(ss.vars["r"])) - model.params["phi_pi"])
    assert abs(pi_dev[1] - predicted) < 0.2 * abs(predicted)
    # Deviation decays well below its peak by the horizon end.
    assert abs(pi_dev[-1]) < 0.05 * np.max(np.abs(pi_dev))
