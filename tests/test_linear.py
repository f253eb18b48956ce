"""Linearized sequence-space impulse responses (`solvers/linear.py`).

The linear path is one preconditioned Newton step; its defining property
is first-order exactness: the gap to the NONLINEAR solution is O(shock²).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.solvers.linear import irf_table, linear_impulse_response
from hank_tpu.solvers.newton import newton_raphson_hank
from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian


@pytest.fixture(scope="module")
def lin_setup(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    Jbar = get_steady_state_jacobian(ss, model)
    return model, ss, Jbar


def _paths(model, eps_shock):
    T = model.compspec.T
    t = jnp.arange(1, T, dtype=jnp.float64)
    return {"Z": 1.0 + eps_shock * 0.8 ** t}


def test_linear_removes_first_order_residual(lin_setup):
    model, ss, Jbar = lin_setup
    exog = _paths(model, 0.01)
    x_lin, info = linear_impulse_response(Jbar, exog, model, ss, ss)
    # The Newton step kills the linear part: ||F(x_lin)|| = O(dZ^2), so it
    # must sit far below the forcing ||F(x_ss)|| = O(dZ).
    assert float(info["residual_norm"]) < 1e-2 * float(info["f0_norm"])


def test_gap_to_nonlinear_is_quadratic_in_shock(lin_setup):
    model, ss, Jbar = lin_setup
    gaps = []
    for eps_shock in (0.02, 0.01):
        exog = _paths(model, eps_shock)
        x_lin, _ = linear_impulse_response(Jbar, exog, model, ss, ss,
                                           compute_residual=False)
        x_nl, info = newton_raphson_hank(x_lin, Jbar, exog, model, ss, ss,
                                         method="newton_krylov", eps=1e-11)
        assert float(info["residual_norm"]) < 1e-11
        gaps.append(float(jnp.max(jnp.abs(x_lin - x_nl))))
    # Halving the shock should quarter the gap (allow 3x-6x for the
    # piecewise-linear policy kinks).
    ratio = gaps[0] / gaps[1]
    assert 2.5 < ratio < 8.0, (gaps, ratio)


def test_linear_is_good_warm_start(lin_setup):
    model, ss, Jbar = lin_setup
    exog = _paths(model, 0.1)
    x_lin, _ = linear_impulse_response(Jbar, exog, model, ss, ss,
                                       compute_residual=False)
    T = model.compspec.T
    x_ss = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), T - 1)
    _, from_lin = newton_raphson_hank(x_lin, Jbar, exog, model, ss, ss,
                                      method="newton_krylov", eps=1e-9)
    _, from_ss = newton_raphson_hank(x_ss, Jbar, exog, model, ss, ss,
                                     method="newton_krylov", eps=1e-9)
    assert float(from_lin["residual_norm"]) < 1e-9
    assert int(from_lin["iterations"]) <= int(from_ss["iterations"])


def test_irf_table_shapes_and_deviations(lin_setup):
    model, ss, Jbar = lin_setup
    exog = _paths(model, 0.01)
    x_lin, _ = linear_impulse_response(Jbar, exog, model, ss, ss,
                                       compute_residual=False)
    table = irf_table(x_lin, model, ss)
    endog = model.vars_of_type("endogenous")
    assert set(table) == set(endog)
    Tm1 = model.compspec.T - 1
    for k, v in table.items():
        assert v.shape == (Tm1,)
    # Economics of a positive transitory TFP shock: output, wages, and
    # capital all rise on impact / over the path. (No decay check: at the
    # fixture's T=12 the slow capital stock legitimately peaks at the
    # horizon end.)
    assert float(table["Y"][0]) > 0.0
    assert float(table["w"][0]) > 0.0
    assert float(jnp.max(table["KS"])) > 0.0
