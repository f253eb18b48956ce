"""SS sequence-space Jacobian: exactness against dense ground truth.

Strengthens the reference's column-spot-check (`test_SteadyState.jl:162-231`,
abs tol 1e-5 at 7 columns) to a FULL-matrix comparison against a dense
`jax.jacfwd` of the complete pipeline at tolerance 1e-9 — which also settles
the finite-horizon boundary question the reference leaves open
(`SteadyStateJacobian.jl:344-384`): the Toeplitz assembly is exact with NO
boundary correction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hank_tpu.solvers.ss_jacobian import (
    dense_path_jacobian,
    direct_jacobian_blocks,
    get_steady_state_jacobian,
)


@pytest.fixture(scope="module")
def jbar(ks_small, ks_small_ss):
    return get_steady_state_jacobian(ks_small_ss, ks_small)


def test_toeplitz_matches_dense_ground_truth(ks_small, ks_small_ss, jbar):
    J_dense = np.asarray(dense_path_jacobian(ks_small_ss, ks_small_ss, ks_small))
    diff = np.abs(np.asarray(jbar) - J_dense)
    assert diff.max() < 1e-9, f"max |J_toeplitz - J_dense| = {diff.max():.3e}"


def test_jacobian_shape_and_square_system(ks_small, jbar):
    cs = ks_small.compspec
    n = cs.n_endog * (cs.T - 1)
    assert jbar.shape == (n, n)


def test_jacobian_nonsingular(jbar):
    s = np.linalg.svd(np.asarray(jbar), compute_uv=False)
    assert s[-1] > 1e-10 * s[0]


def test_direct_blocks_structure(ks_small, ks_small_ss):
    """KS has max_lag=1, max_lead=0: the lead block must vanish; nonzero
    derivative blocks exist even where residual primal values are exactly 0
    (the PR#481 sparsity-at-zero regression, SURVEY §2.8)."""
    blocks, k = direct_jacobian_blocks(ks_small_ss, ks_small)
    assert k == 1 and blocks.shape[0] == 3
    assert float(jnp.max(jnp.abs(blocks[0]))) < 1e-12      # lead slot: zero
    assert float(jnp.max(jnp.abs(blocks[1]))) > 0.1        # contemporaneous
    assert float(jnp.max(jnp.abs(blocks[2]))) > 0.01       # lag-1
    # At the SS, residuals are ~0 but derivatives are not: nothing may be
    # dropped based on primal values.
    assert np.count_nonzero(np.abs(np.asarray(blocks[1])) > 1e-8) >= 4


def test_nonsquare_system_raises(ks_small):
    import dataclasses

    bad = dataclasses.replace(ks_small, equations=ks_small.equations[:3])
    with pytest.raises(ValueError, match="not square"):
        get_steady_state_jacobian(None, bad)


def test_jacobian_columns_vs_direct_jvp(ks_small, ks_small_ss, jbar):
    """The reference's own cross-check: assembled columns vs independent
    full-pipeline JVPs at several columns (`test_SteadyState.jl:197-206`)."""
    from hank_tpu.solvers.newton import make_full_residual_fn

    model, ss = ks_small, ks_small_ss
    cs = model.compspec
    Tm1 = cs.T - 1
    n = cs.n_endog * Tm1
    exog = {"Z": jnp.full((Tm1,), ss.vars["Z"])}
    F = make_full_residual_fn(model, ss, ss, exog)
    x_ss = jnp.tile(jnp.asarray([ss.vars[k] for k in model.vars_of_type("endogenous")]), Tm1)

    cols = [0, 1, 2, n // 2, n - 2, n - 1]
    for c in cols:
        e = jnp.zeros(n).at[c].set(1.0)
        col = jax.jvp(F, (x_ss,), (e,))[1]
        assert float(jnp.max(jnp.abs(col - jbar[:, c]))) < 1e-9
