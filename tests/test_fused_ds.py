"""Double-single fused residual vs the true-f64 pipeline (CPU reference).

The ds kernel must reproduce `make_full_residual_fn`'s f64 residual to
~1e-10 absolute — two decades below the 1e-8 solve target — while using
only f32 arithmetic inside the kernel. CPU f64 is real f64 here, so this
is a genuine accuracy certification, not self-consistency.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.ops.fused_ds import (make_ds_residual_fn, supports_ds_residual)
from hank_tpu.solvers.newton import make_full_residual_fn

f32 = jnp.float32


@pytest.fixture(scope="module")
def setup(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    Tm1 = model.compspec.T - 1
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, model.compspec.T)}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    return model, ss, exog, x_ss


def test_supports_predicate(ks_small):
    assert supports_ds_residual(ks_small)  # γ = 2, fused family
    import dataclasses
    frac = dataclasses.replace(
        ks_small, params={**ks_small.params, "γ": 1.5})
    assert not supports_ds_residual(frac)  # non-integer γ: no ds root


def test_ds_residual_matches_f64(setup):
    model, ss, exog, x_ss = setup
    F64 = make_full_residual_fn(model, ss, ss, exog)
    F_ds = make_ds_residual_fn(model, ss, ss, exog, interpret=True)

    rng = np.random.default_rng(11)
    for trial in range(3):
        x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
        ref = F64(x)
        out = F_ds(x)
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < 2e-10, f"trial {trial}: ds residual off by {err:.2e}"


def test_ds_residual_resolves_below_f32(setup):
    """At the SOLVED path the residual is ~1e-9; the ds evaluation must
    track the f64 one there (the f32 fused residual cannot — its noise
    floor is ~1e-6)."""
    from hank_tpu.solvers.newton import make_path_solver
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss, exog, x_ss = setup
    J = get_steady_state_jacobian(ss, model)
    x_sol, info = make_path_solver(J, exog, model, ss, ss,
                                   method="newton_krylov", eps=1e-9)(x_ss)
    assert info["residual_norm"] < 1e-9

    F64 = make_full_residual_fn(model, ss, ss, exog)
    F_ds = make_ds_residual_fn(model, ss, ss, exog, interpret=True)
    n64 = float(jnp.linalg.norm(F64(x_sol)))
    nds = float(jnp.linalg.norm(F_ds(x_sol)))
    # Norms of a ~1e-9-residual path must agree to ~1e-10.
    assert abs(nds - n64) < 1e-10
    assert nds < 2e-9


def test_ds_bucketed_horizon(ks_small, ks_small_ss):
    """Tm1 = 50 rides the 64-bucket with ending-SS price padding."""
    import dataclasses

    model = dataclasses.replace(
        ks_small, compspec=dataclasses.replace(ks_small.compspec, T=51))
    ss = ks_small_ss
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, 51)}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), 50)
    F64 = make_full_residual_fn(model, ss, ss, exog)
    F_ds = make_ds_residual_fn(model, ss, ss, exog, interpret=True)
    rng = np.random.default_rng(13)
    x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
    err = float(jnp.max(jnp.abs(F_ds(x) - F64(x))))
    assert err < 2e-10


def test_ds_residual_hank_one_asset():
    """ds residual covers the one-asset HANK family (two aggregates)."""
    from tests.conftest import solve_ss_cached
    from tests.test_hank_one_asset import build_small_hank

    model = build_small_hank(T=12)
    assert supports_ds_residual(model)
    ss = solve_ss_cached(model)
    Tm1 = model.compspec.T - 1
    t = jnp.arange(1, model.compspec.T, dtype=jnp.float64)
    exog = {"Y": jnp.ones(Tm1), "eps_m": -0.002 * 0.6 ** t}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    F64 = make_full_residual_fn(model, ss, ss, exog)
    F_ds = make_ds_residual_fn(model, ss, ss, exog, interpret=True)
    rng = np.random.default_rng(17)
    x = x_ss + 0.002 * jnp.asarray(rng.normal(size=x_ss.shape))
    err = float(jnp.max(jnp.abs(F_ds(x) - F64(x))))
    assert err < 2e-10


def test_ds_kernel_has_no_64bit_vectors(setup):
    """Mosaic layout-inference guard (conftest helper)."""
    from tests.conftest import assert_no_64bit_vectors_in_kernels
    from hank_tpu.ops.fused_ds import make_ds_residual_fn
    model, ss, exog, x_ss = setup
    F = make_ds_residual_fn(model, ss, ss, exog, interpret=False)
    assert_no_64bit_vectors_in_kernels(F, x_ss)
