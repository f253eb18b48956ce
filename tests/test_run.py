"""End-to-end driver tests (`run.py::solve_model` — library surface).

The CLI (`python -m hank_tpu.run`) is a thin argparse wrapper over
`solve_model`; this exercises the library call the way the reference's
driver layer works (`RunMain.jl:12-61`, `solveModel`): full pipeline —
cached steady states + J̄ + path solve — on the small KS fixture with its
OWN default shock design (the model is a permanent Z: 1→2 transition, so
`get_or_solve` returns two distinct steady states and the default exog
paths connect them), plus the warm-start and linear-method surfaces added
in round 5.
"""

import numpy as np
import pytest

from hank_tpu.run import solve_model


def test_solve_model_end_to_end(ks_small):
    x, info, ss0, ssT = solve_model(ks_small, verbose=False)
    Tm1 = ks_small.compspec.T - 1
    endog = ks_small.vars_of_type("endogenous")
    assert x.shape == (Tm1, len(endog))
    assert float(info["residual_norm"]) < 1e-8
    # Permanent shock: distinct steady states, and the path must end
    # closer to the ending SS than it starts.
    iY = endog.index("Y")
    assert abs(ss0.vars["Y"] - ssT.vars["Y"]) > 0.1
    assert abs(x[-1, iY] - ssT.vars["Y"]) < abs(x[0, iY] - ssT.vars["Y"])


def test_warm_start_linear_agrees_with_ss_start(ks_small):
    x_ss, i_ss, *_ = solve_model(ks_small, verbose=False, warm_start="ss")
    x_lin, i_lin, *_ = solve_model(ks_small, verbose=False,
                                   warm_start="linear")
    assert float(i_ss["residual_norm"]) < 1e-8
    assert float(i_lin["residual_norm"]) < 1e-8
    # Same root regardless of the starting point.
    np.testing.assert_allclose(x_lin, x_ss, atol=1e-6)
    # The linear start can only remove opening contractions, never add
    # more than the odd trajectory wiggle.
    assert int(i_lin["iterations"]) <= int(i_ss["iterations"]) + 1


def test_warm_start_rejects_unknown(ks_small):
    with pytest.raises(ValueError, match="warm_start"):
        solve_model(ks_small, verbose=False, warm_start="banana")


def test_warm_start_guard_rejects_bad_linear_step():
    """The keep-best guard falls back to the SS path when the linear step
    is infeasible (NaN residual — e.g. exog paths inconsistent with the
    ending SS, caught live by /verify) or does not beat the forcing."""
    from hank_tpu.run import _accept_warm_start

    x_ss, x_lin = np.zeros(4), np.ones(4)
    ok = {"residual_norm": 1e-3, "f0_norm": 1.0}
    assert _accept_warm_start(x_ss, x_lin, ok, False) is x_lin
    nan = {"residual_norm": float("nan"), "f0_norm": 1.0}
    assert _accept_warm_start(x_ss, x_lin, nan, False) is x_ss
    worse = {"residual_norm": 2.0, "f0_norm": 1.0}
    assert _accept_warm_start(x_ss, x_lin, worse, False) is x_ss


def test_method_linear_first_order_quality(ks_small):
    """The linear path must beat the trivial (SS-path) guess: its residual
    sits below the first-order forcing, and it lands closer to the
    nonlinear root than the ending-SS path does — even on this model's
    LARGE permanent shock (Z doubles), where O(shock²) terms are big."""
    x_lin, info, ss0, ssT = solve_model(ks_small, verbose=False,
                                        method="linear")
    x_nl, _, _, _ = solve_model(ks_small, verbose=False)
    Tm1 = ks_small.compspec.T - 1
    endog = ks_small.vars_of_type("endogenous")
    assert x_lin.shape == (Tm1, len(endog))
    assert float(info["residual_norm"]) < float(info["f0_norm"])
    x_sspath = np.tile([float(ssT.vars[k]) for k in endog], (Tm1, 1))
    gap_lin = float(np.max(np.abs(x_lin - x_nl)))
    gap_ss = float(np.max(np.abs(x_sspath - x_nl)))
    assert gap_lin < gap_ss
