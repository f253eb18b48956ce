"""Two-asset HANK (fiscal shock): the real two-endogenous-dimension model.

BASELINE config 3. The household state is (liquid, illiquid, productivity);
both asset markets clear, pinning two returns; taxes balance the budget.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.models import load_model
from tests.conftest import solve_ss_cached


def build_small_two_asset(T=12, n_b=24, n_a=12, n_e=4):
    from hank_tpu.model.grids import make_double_exponential_grid, rouwenhorst
    from hank_tpu.model.structures import HeterogeneityDimension

    model = load_model("hank_two_asset", T=T)
    liq = HeterogeneityDimension(
        "liquid", "endogenous", n_b,
        jnp.asarray(make_double_exponential_grid(0.0, 120.0, n_b)), None, "B")
    ill = HeterogeneityDimension(
        "illiquid", "endogenous", n_a,
        jnp.asarray(make_double_exponential_grid(0.0, 40.0, n_a)), None, "A")
    Pi, _, z = rouwenhorst(n_e, 0.966, 0.283)
    inc = HeterogeneityDimension(
        "income", "exogenous", n_e, jnp.asarray(z), jnp.asarray(Pi), None)
    return dataclasses.replace(
        model, heterogeneity={"liquid": liq, "illiquid": ill, "income": inc})


@pytest.fixture(scope="module")
def ta_model():
    return build_small_two_asset()


@pytest.fixture(scope="module")
def ta_ss(ta_model):
    return solve_ss_cached(ta_model)


def test_two_asset_ss_clears_both_markets(ta_model, ta_ss):
    p = ta_model.params
    assert abs(float(ta_ss.vars["B"]) - p["Bg"]) < 1e-8
    assert abs(float(ta_ss.vars["A"]) - p["Ag"]) < 1e-8
    r, ra, tau = (float(ta_ss.vars[k]) for k in ("r", "ra", "tau"))
    assert abs(tau - r * p["Bg"] - ra * p["Ag"]) < 1e-9   # budget balance
    assert abs(float(ta_ss.vars["C"]) - 1.0) < 1e-8       # Walras
    assert abs(float(ta_ss.D.sum()) - 1.0) < 1e-10
    assert ta_ss.D.shape == (24, 12, 4)


def test_two_asset_illiquid_mechanics(ta_model, ta_ss):
    """A' policy equals (1−λ)((1+ra)a + s·inc) — independent of b."""
    p = ta_model.params
    polA = np.asarray(ta_ss.policies["A"])
    assert np.allclose(polA[0], polA[-1], atol=1e-12)     # no b dependence
    agrid = np.asarray(ta_model.heterogeneity["illiquid"].grid)
    inc = (1.0 - float(ta_ss.vars["tau"])) * np.asarray(
        ta_model.heterogeneity["income"].grid)
    expected = (1 - p["lam"]) * ((1 + float(ta_ss.vars["ra"])) * agrid[:, None]
                                 + p["s"] * inc[None, :])
    assert np.allclose(polA[0], expected, atol=1e-10)


def test_two_asset_pipeline_consistency(ta_model, ta_ss):
    from hank_tpu.solvers.steady_state import single_run

    Tm1 = ta_model.compspec.T - 1
    res = single_run(ta_ss, ta_ss, ta_model, {"G": jnp.zeros(Tm1)})
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_two_asset_jacobian_matches_dense(ta_model, ta_ss):
    from hank_tpu.solvers.ss_jacobian import (
        dense_path_jacobian,
        get_steady_state_jacobian,
    )

    J = np.asarray(get_steady_state_jacobian(ta_ss, ta_model))
    Jd = np.asarray(dense_path_jacobian(ta_ss, ta_ss, ta_model))
    assert np.abs(J - Jd).max() < 1e-8


def test_two_asset_fiscal_shock(ta_model, ta_ss):
    from hank_tpu.models.hank_two_asset import fiscalShock
    from hank_tpu.solvers.newton import newton_raphson_hank
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss = ta_model, ta_ss
    Tm1 = model.compspec.T - 1
    exog = {"G": fiscalShock(Tm1)}
    x0 = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), Tm1)
    J = get_steady_state_jacobian(ss, model)
    x, info = newton_raphson_hank(x0, J, exog, model, ss, ss,
                                  method="newton_krylov", eps=1e-9)
    assert float(info["residual_norm"]) < 1e-9
    path = np.asarray(x).reshape(Tm1, 3)
    names = model.vars_of_type("endogenous")
    tau_path = path[:, names.index("tau")]
    r_path = path[:, names.index("r")]
    # Tax-financed spending raises taxes on impact and crowds the liquid
    # market (higher r needed to hold bond demand at Bg with lower income).
    assert tau_path[0] > float(ss.vars["tau"]) + 1e-4
    assert r_path[0] > float(ss.vars["r"])
