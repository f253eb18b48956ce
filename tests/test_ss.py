"""Steady-state solver: the reference's end-to-end SS checks
(`test_SteadyState.jl:33-84`) — manual re-evaluation of all equilibrium
equations at the solution, residual-norm acceptance, internal consistency of
the full pipeline at the steady state."""

import jax.numpy as jnp
import numpy as np


def test_ss_equilibrium_equations(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    Z = 1.0
    alpha = model.params["α"]
    delta = model.params["δ"]
    Y, KS, r, w, KD = (float(ss.vars[k]) for k in ("Y", "KS", "r", "w", "KD"))

    # Manually re-evaluate the four KS equilibrium conditions.
    assert abs(Y - Z * KS ** alpha) < 1e-8
    assert abs(r + delta - alpha * Z * KS ** (alpha - 1)) < 1e-8
    assert abs(w - (1 - alpha) * Z * KS ** alpha) < 1e-8
    assert abs(KS - KD) < 1e-8

    # Sanity: r below the supremum 1/β - 1 for finite household wealth.
    assert r < 1.0 / model.params["β"] - 1.0


def test_ss_distribution_is_stationary(ks_small, ks_small_ss):
    from hank_tpu.ops.transition import forward_step

    model, ss = ks_small, ks_small_ss
    grid = model.heterogeneity["wealth"].grid
    Pi = model.heterogeneity["productivity"].transition
    D_next = forward_step(ss.policies["KD"], ss.D, grid, [Pi])
    assert float(jnp.max(jnp.abs(D_next - ss.D))) < 1e-10
    assert abs(float(ss.D.sum()) - 1.0) < 1e-12
    assert float(ss.D.min()) >= -1e-15


def test_ss_aggregate_matches_distribution(ks_small, ks_small_ss):
    model, ss = ks_small, ks_small_ss
    agg = float(jnp.sum(ss.policies["KD"] * ss.D))
    assert abs(agg - float(ss.vars["KD"])) < 1e-9


def test_full_pipeline_zero_at_ss(ks_small, ks_small_ss):
    """single_run: F(x_ss) ≈ 0 with a constant Z path (`SteadyState.jl:272-286`)."""
    from hank_tpu.solvers.steady_state import single_run

    model, ss = ks_small, ks_small_ss
    Tm1 = model.compspec.T - 1
    exog = {"Z": jnp.full((Tm1,), 1.0)}
    res = single_run(ss, ss, model, exog)
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_ss_residual_norm(ks_small, ks_small_ss):
    """SS residual acceptance (reference tol 10·ε = 1e-5; ours is 1e-9)."""
    from hank_tpu.blocks.assemble import residuals

    model, ss = ks_small, ks_small_ss
    cs = model.compspec
    xvec = jnp.stack([jnp.asarray(ss.vars[k]) for k in model.var_names()])
    x_mat = jnp.tile(xvec[:, None], (1, 1 + cs.max_lag + cs.max_lead))
    z = residuals(x_mat, model)
    assert float(jnp.linalg.norm(z)) < 1e-8


def test_get_steady_states_transitory_shares_object(monkeypatch, ks_small_ss):
    """Identical specs -> one solve (`SteadyState.jl:249-252`)."""
    import dataclasses

    from hank_tpu.solvers import steady_state as ss_mod
    from tests.conftest import build_small_ks

    model = build_small_ks(T=12)
    model = dataclasses.replace(model, ss_ending=model.ss_initial)
    calls = []
    monkeypatch.setattr(ss_mod, "find_ss",
                        lambda m, spec, label, v=False: calls.append(label) or ks_small_ss)
    ss0, ssT = ss_mod.get_steady_states(model)
    assert ss0 is ssT
    assert calls == ["initial"]
