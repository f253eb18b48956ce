"""Plotting utilities (the reference driver's plot step, RunMain.jl:57-60)."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from hank_tpu.utils.plotting import plot_distribution, plot_transition  # noqa: E402


def test_plot_transition_writes_png(tmp_path, ks_small_ss):
    x_path = np.linspace(1.0, 2.0, 19 * 4).reshape(19, 4)
    out = plot_transition(x_path, ("Y", "KS", "r", "w"),
                          str(tmp_path / "path.png"),
                          ss_initial=ks_small_ss, ss_ending=ks_small_ss,
                          title="test")
    assert (tmp_path / "path.png").stat().st_size > 1000
    assert out.endswith("path.png")


def test_plot_distribution_writes_png(tmp_path, ks_small, ks_small_ss):
    import jax.numpy as jnp

    from hank_tpu.blocks.backward import backward_iteration
    from hank_tpu.blocks.forward import distribution_path

    model, ss = ks_small, ks_small_ss
    T = model.compspec.T
    exog = {"Z": 1.0 + 0.1 * 0.8 ** jnp.arange(1, T, dtype=jnp.float64)}
    x0 = jnp.tile(jnp.asarray(
        [ss.vars[k] for k in model.vars_of_type("endogenous")]), T - 1)
    Ds = distribution_path(backward_iteration(x0, exog, model, ss.vars,
                                              ss.value), model, ss.D)
    grid = model.endog_dims()[0].grid
    plot_distribution(Ds, grid, str(tmp_path / "dist.png"), title="D path")
    assert (tmp_path / "dist.png").stat().st_size > 1000
