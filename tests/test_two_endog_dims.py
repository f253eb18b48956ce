"""Two endogenous heterogeneity dimensions, end-to-end.

The reference hard-errors on more than one endogenous dimension
(`ForwardIteration.jl:267-269`, `SteadyState.jl:79-80`) — blocking two-asset
HANK. This suite drives a synthetic two-asset model (liquid × illiquid ×
productivity state space, smooth contraction "Bellman", two policies) through
the ENTIRE pipeline: VFI fixed point, matrix-free invariant distribution,
steady-state Newton, backward/forward scans, and the block-Toeplitz SS
Jacobian validated against dense ground truth.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.model.grids import rouwenhorst
from hank_tpu.model.parser import compile_residuals, detect_max_lag_lead
from hank_tpu.model.structures import (
    CompSpec,
    HeterogeneityDimension,
    SequenceModel,
    SteadyStateSpec,
    Variable,
)

N_B, N_A, N_E = 12, 10, 3


def _toy_value_fn(value_next, xvals, model):
    """Smooth contraction with two policies (liquid BH, illiquid AH).

    Policies respond to the aggregate price q and the exogenous Z so the
    Jacobian has both direct and policy-mediated blocks.
    """
    bonds = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    prod = model.heterogeneity["prod"]
    q = xvals["q"]
    Z = xvals["Z"]

    b = bonds.grid[:, None, None]
    a = illiq.grid[None, :, None]
    e = prod.grid[None, None, :]

    ev = value_next @ prod.transition.T          # expectation over e'
    value = 0.8 * ev + 0.05 * (b + a) * e + 0.1 * q

    pol_b = 0.55 * b + 0.25 * a * 0.2 + 0.6 * q + 0.08 * e * Z
    pol_a = 0.70 * a + 0.10 * b * 0.3 + 0.4 * q + 0.05 * e
    shape = (N_B, N_A, N_E)
    return {"Value": jnp.broadcast_to(value, shape),
            "BH": jnp.broadcast_to(pol_b, shape),
            "AH": jnp.broadcast_to(pol_a, shape)}


def build_two_asset_toy(T=8):
    bgrid = np.linspace(0.0, 10.0, N_B)
    agrid = np.linspace(0.0, 14.0, N_A)
    Pi, _, z = rouwenhorst(N_E, 0.8, 0.3)

    het = {
        "liquid": HeterogeneityDimension("liquid", "endogenous", N_B,
                                         jnp.asarray(bgrid), None, "BH"),
        "illiquid": HeterogeneityDimension("illiquid", "endogenous", N_A,
                                           jnp.asarray(agrid), None, "AH"),
        "prod": HeterogeneityDimension("prod", "exogenous", N_E,
                                       jnp.asarray(z), jnp.asarray(Pi), None),
    }
    variables = {
        "q": Variable("q", "endogenous"),
        "BH": Variable("BH", "heterogeneous"),
        "AH": Variable("AH", "heterogeneous"),
        "Z": Variable("Z", "exogenous",
                      seq_fn=lambda TT, **kw: jnp.ones(TT, dtype=jnp.float64)),
    }
    equations = ("q = 0.12*BH + 0.06*AH + 0.3*Z + 0.1*q(-1)",)
    names = tuple(variables)
    max_lag, max_lead = detect_max_lag_lead(list(equations), names)
    residuals_fn = compile_residuals(list(equations), names, set())
    compspec = CompSpec(T=T, eps=1e-9, dx=1e-8, n_v=4, n_endog=1,
                        max_lag=max_lag, max_lead=max_lead)
    spec = SteadyStateSpec(fixed={"Z": 1.0}, guesses={"q": 1.0})
    return SequenceModel(
        variables=variables, equations=equations, compspec=compspec,
        params={}, residuals_fn=residuals_fn, ss_initial=spec,
        ss_ending=spec, heterogeneity=het, value_fn=_toy_value_fn,
        name="two-asset toy")


@pytest.fixture(scope="module")
def toy():
    return build_two_asset_toy()


@pytest.fixture(scope="module")
def toy_ss(toy):
    from hank_tpu.solvers.steady_state import find_ss

    return find_ss(toy, toy.ss_initial, "toy")


def test_two_dim_ss(toy, toy_ss):
    assert toy.state_shape() == (N_B, N_A, N_E)
    D = toy_ss.D
    assert D.shape == (N_B, N_A, N_E)
    assert abs(float(D.sum()) - 1.0) < 1e-10
    assert float(D.min()) >= -1e-12
    # Stationarity under the joint two-dimensional lottery.
    from hank_tpu.ops.transition import exog_apply, lottery_apply_multi

    pols = [toy_ss.policies["BH"], toy_ss.policies["AH"]]
    grids = [toy.heterogeneity["liquid"].grid, toy.heterogeneity["illiquid"].grid]
    D_next = exog_apply(lottery_apply_multi(pols, D, grids),
                        [toy.heterogeneity["prod"].transition], 2)
    assert float(jnp.max(jnp.abs(D_next - D))) < 1e-9
    # Aggregates consistent.
    assert abs(float(jnp.sum(toy_ss.policies["BH"] * D))
               - float(toy_ss.vars["BH"])) < 1e-9


def test_two_dim_pipeline_zero_at_ss(toy, toy_ss):
    from hank_tpu.solvers.steady_state import single_run

    Tm1 = toy.compspec.T - 1
    res = single_run(toy_ss, toy_ss, toy, {"Z": jnp.ones(Tm1)})
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_two_dim_jacobian_matches_dense(toy, toy_ss):
    from hank_tpu.solvers.ss_jacobian import (
        dense_path_jacobian,
        get_steady_state_jacobian,
    )

    J_toep = np.asarray(get_steady_state_jacobian(toy_ss, toy))
    J_dense = np.asarray(dense_path_jacobian(toy_ss, toy_ss, toy))
    assert np.abs(J_toep - J_dense).max() < 1e-8


def test_two_dim_path_solve(toy, toy_ss):
    from hank_tpu.solvers.newton import newton_raphson_hank
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    Tm1 = toy.compspec.T - 1
    t = jnp.arange(1, toy.compspec.T, dtype=jnp.float64)
    exog = {"Z": 1.0 + 0.05 * 0.7 ** t}
    x0 = jnp.full((Tm1,), float(toy_ss.vars["q"]))
    J = get_steady_state_jacobian(toy_ss, toy)
    x, info = newton_raphson_hank(x0, J, exog, toy, toy_ss, toy_ss,
                                  method="newton_krylov", eps=1e-10)
    assert float(info["residual_norm"]) < 1e-10
    assert float(jnp.max(jnp.abs(x - x0))) > 1e-3   # the shock moves q
