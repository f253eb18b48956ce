"""Fused primal+tangent sweep kernel vs the XLA jvp-through-scans path.

The kernel must reproduce `jax.jvp` of the f32 equilibrium map to f32
roundoff — same floors, clip conventions, and boundary gradient zeros as
`models/krusell_smith.py::ValueFunction` + `ops/transition.lottery_apply`.
Runs in Pallas interpret mode on CPU (the suite pins JAX_PLATFORMS=cpu);
the non-interpret TPU compile + perf check is scripts/tpu_fused_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.ops.fused_sweep import (fused_sweep_jvp, make_fused_jvp_dir,
                                      supports_fused_sweep)
from hank_tpu.ops.precision import cast_model, cast_paths, cast_ss
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
    assert supports_fused_sweep(ks_small)
    from hank_tpu.models import load_model
    assert supports_fused_sweep(load_model("ks_large_grid", T=10))
    # hank_one_asset declares the fused_prices hook (income (Y − rB̄)·e).
    assert supports_fused_sweep(load_model("hank_one_asset", T=10))
    # two endogenous household dims — outside the kernel's scope.
    assert not supports_fused_sweep(load_model("hank_two_asset", T=10))


def test_fused_jvp_matches_xla(setup):
    model, ss, exog, x_ss = setup
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    jvp_dir = make_fused_jvp_dir(model, ss, ss, exog, interpret=True)

    rng = np.random.default_rng(0)
    for trial in range(3):
        x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
        v = jnp.asarray(rng.normal(size=x_ss.shape))
        ref = jax.jvp(F32, (x.astype(f32),), (v.astype(f32),))[1]
        out = jvp_dir(x, v)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-5 * max(scale, 1.0)


def test_fused_primal_matches_forward_pipeline(setup):
    """The kernel's primal aggregate path == backward+forward XLA blocks."""
    from hank_tpu.blocks.backward import backward_iteration
    from hank_tpu.blocks.forward import forward_iteration

    model, ss, exog, x_ss = setup
    model32 = cast_model(model, f32)
    ss32 = cast_ss(ss, f32)
    exog32 = cast_paths(exog, f32)
    Tm1 = model.compspec.T - 1
    nE = model.compspec.n_endog
    endog = model.vars_of_type("endogenous")
    i_r, i_w = endog.index("r"), endog.index("w")

    rng = np.random.default_rng(1)
    x = (x_ss + 0.02 * jnp.asarray(rng.normal(size=x_ss.shape))).astype(f32)
    pol = backward_iteration(x, exog32, model32, ss32.vars, ss32.value)
    ref = forward_iteration(pol, model32, ss32.D)["KD"]

    xp = x.reshape(Tm1, nE)
    p = model.params
    wealth = model32.endog_dims()[0]
    prod = model32.exog_dims()[0]
    agg, dagg, aggc, daggc = fused_sweep_jvp(
        xp[:, i_r], xp[:, i_w], jnp.zeros(Tm1, f32), jnp.zeros(Tm1, f32),
        ss32.value, ss32.D, wealth.grid, prod.grid, prod.transition,
        beta=float(p["β"]), gamma=float(p["γ"]),
        borrow_cons=float(p["borrow_cons"]), interpret=True)
    assert float(jnp.max(jnp.abs(agg - ref))) < 1e-5
    assert float(jnp.max(jnp.abs(dagg))) == 0.0   # zero tangent in → zero out

    # Consumption aggregate: rebuild c from the budget with the same-period
    # prices and aggregate against the post-transition distribution path.
    from hank_tpu.blocks.forward import distribution_path
    D_path = distribution_path(pol, model32, ss32.D)   # (T, n_a, n_e)
    grid_col = wealth.grid[:, None]
    e_row = prod.grid[None, :]
    ref_c = []
    for t in range(Tm1):
        c_t = jnp.maximum((1.0 + xp[t, i_r]) * grid_col
                          + xp[t, i_w] * e_row - pol["KD"][t], 1e-12)
        ref_c.append(jnp.sum(c_t * D_path[t + 1]))
    ref_c = jnp.asarray(ref_c)
    assert float(jnp.max(jnp.abs(aggc - ref_c))) < 1e-5
    assert float(jnp.max(jnp.abs(daggc))) == 0.0


def test_bucketed_horizon_matches_xla(ks_small, ks_small_ss):
    """Tm1 = 50 rides the 64-bucket: the kernel runs 14 extra backward steps
    at the ending-SS prices (V stays at its fixed point, tangents stay zero)
    and the sliced outputs must still match the exact-shape XLA jvp."""
    from hank_tpu.ops.fused_sweep import _bucket_Tm1

    assert _bucket_Tm1(50) == 64 and _bucket_Tm1(11) == 11
    assert _bucket_Tm1(199) == 299 and _bucket_Tm1(299) == 299

    model, ss = ks_small, ks_small_ss
    import dataclasses
    model = dataclasses.replace(
        model, compspec=dataclasses.replace(model.compspec, T=51))
    Tm1 = 50
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, 51)}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    jvp_dir = make_fused_jvp_dir(model, ss, ss, exog, interpret=True)
    rng = np.random.default_rng(7)
    x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
    v = jnp.asarray(rng.normal(size=x_ss.shape))
    ref = jax.jvp(F32, (x.astype(f32),), (v.astype(f32),))[1]
    out = jvp_dir(x, v)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-5 * max(scale, 1.0)


def test_fused_jvp_matches_xla_hank_one_asset():
    """The generalized kernel must serve the one-asset HANK family (income
    (Y − rB̄)·e via the fused_prices hook; B and C both aggregated)."""
    from tests.test_hank_one_asset import build_small_hank
    from tests.conftest import solve_ss_cached

    model = build_small_hank(T=12)
    ss = solve_ss_cached(model)
    Tm1 = model.compspec.T - 1
    t = jnp.arange(1, model.compspec.T, dtype=jnp.float64)
    exog = {"Y": jnp.ones(Tm1), "eps_m": -0.002 * 0.6 ** t}
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)

    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    jvp_dir = make_fused_jvp_dir(model, ss, ss, exog, interpret=True)
    rng = np.random.default_rng(3)
    for trial in range(2):
        x = x_ss + 0.002 * jnp.asarray(rng.normal(size=x_ss.shape))
        v = jnp.asarray(rng.normal(size=x_ss.shape))
        ref = jax.jvp(F32, (x.astype(f32),), (v.astype(f32),))[1]
        out = jvp_dir(x, v)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) < 3e-5 * max(scale, 1.0)


def test_fused_residual_matches_f32_xla(setup):
    """make_fused_residual_fn == the f32 XLA residual to f32 roundoff."""
    from hank_tpu.ops.fused_sweep import make_fused_residual_fn

    model, ss, exog, x_ss = setup
    F32 = make_full_residual_fn(cast_model(model, f32), cast_ss(ss, f32),
                                cast_ss(ss, f32), cast_paths(exog, f32))
    R32 = make_fused_residual_fn(model, ss, ss, exog, interpret=True)
    rng = np.random.default_rng(5)
    x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))
    ref = F32(x.astype(f32))
    out = R32(x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-5 * max(scale, 1.0)


def test_path_solver_direction_mode_pallas(setup):
    """Full path solve with fused-kernel directions converges to the same
    solution as the XLA direction path (f64 residuals govern accuracy)."""
    from hank_tpu.solvers.newton import make_path_solver
    from hank_tpu.solvers.ss_jacobian import get_steady_state_jacobian

    model, ss, exog, x_ss = setup
    J = get_steady_state_jacobian(ss, model)
    kw = dict(method="newton_krylov", direction_dtype=f32, eps=1e-8)
    x_pal, info_pal = make_path_solver(J, exog, model, ss, ss,
                                       direction_mode="pallas", **kw)(x_ss)
    x_xla, info_xla = make_path_solver(J, exog, model, ss, ss,
                                       direction_mode="xla", **kw)(x_ss)
    assert info_pal["residual_norm"] < 1e-8
    assert float(jnp.max(jnp.abs(x_pal - x_xla))) < 1e-7


def test_fused_kernels_have_no_64bit_vectors(setup):
    """Mosaic layout-inference guard: no 64-bit VECTOR values inside the
    fused sweep kernel (see conftest.assert_no_64bit_vectors_in_kernels —
    Mosaic CHECK-crashes on them; unroll=2 exercises the unrolled loop)."""
    from tests.conftest import assert_no_64bit_vectors_in_kernels
    model, ss, exog, x_ss = setup
    fused = make_fused_jvp_dir(model, ss, ss, exog, interpret=False)
    assert_no_64bit_vectors_in_kernels(fused, x_ss, jnp.ones_like(x_ss))
