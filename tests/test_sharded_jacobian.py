"""Sharded J̄ build and household-state-axis sharding on the virtual mesh.

The J̄ seed sweeps are embarrassingly parallel (`SteadyStateJacobian.jl:241-243`);
sharding them over the mesh must reproduce the single-device build exactly.
The state-axis sharding (SURVEY §2.10 TP row) must reproduce the unsharded
forward/backward blocks.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.parallel.mesh import make_mesh


def test_sharded_jacobian_matches_single_device(ks_small, ks_small_ss):
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss = ks_small, ks_small_ss
    mesh = make_mesh(model.compspec.n_endog)      # 4 seeds over 4 devices
    J_ref = get_steady_state_jacobian(ss, model)
    J_sh = get_steady_state_jacobian(ss, model, mesh=mesh)
    assert float(jnp.max(jnp.abs(J_sh - J_ref))) < 1e-12


@pytest.fixture(scope="module")
def ks_e8():
    """KS with n_e = 8 so the exogenous axis splits evenly over 8 devices."""
    from tests.conftest import build_small_ks, solve_ss_cached

    model = build_small_ks(T=10, n_a=32, n_e=8)
    return model, solve_ss_cached(model)


def test_forward_iteration_state_sharded(ks_e8):
    from hank_tpu.blocks.backward import backward_iteration
    from hank_tpu.blocks.forward import forward_iteration
    from hank_tpu.parallel.state_sharding import forward_iteration_sharded

    model, ss = ks_e8
    Tm1 = model.compspec.T - 1
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, model.compspec.T)}
    endog = model.vars_of_type("endogenous")
    x = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1) * 1.01

    pol = backward_iteration(x, exog, model, ss.vars, ss.value)
    ref = forward_iteration(pol, model, ss.D)

    mesh = make_mesh(8, ("state",))
    out = forward_iteration_sharded(pol, model, ss.D, mesh)
    for k in ref:
        assert float(jnp.max(jnp.abs(out[k] - ref[k]))) < 1e-12


def test_backward_iteration_state_sharded(ks_e8):
    from hank_tpu.blocks.backward import backward_iteration
    from hank_tpu.parallel.state_sharding import backward_iteration_sharded

    model, ss = ks_e8
    Tm1 = model.compspec.T - 1
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, model.compspec.T)}
    endog = model.vars_of_type("endogenous")
    x = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1) * 1.01

    ref = backward_iteration(x, exog, model, ss.vars, ss.value)
    mesh = make_mesh(8, ("state",))
    out = backward_iteration_sharded(x, exog, model, ss.vars, ss.value, mesh)
    for k in ref:
        assert out[k].shape == ref[k].shape
        assert float(jnp.max(jnp.abs(out[k] - ref[k]))) < 1e-11
        # The policy path really is sharded over the exogenous axis.
        assert len(out[k].sharding.device_set) == 8
