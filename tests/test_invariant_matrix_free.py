"""Matrix-free invariant distribution vs the dense solve, incl. derivatives."""

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.ops.linalg import invariant_dist_colstoch, make_invariant_solver
from hank_tpu.ops.transition import (
    dense_full_transition,
    exog_apply,
    lottery_apply_multi,
)
from hank_tpu.model.grids import rouwenhorst


def _setup(n_a=25, n_e=4, seed=0):
    rng = np.random.default_rng(seed)
    grid = jnp.asarray(np.sort(rng.uniform(0, 10, n_a)))
    Pi, _, _ = rouwenhorst(n_e, 0.9, 0.3)
    Pi = jnp.asarray(Pi)
    # Mean-reverting policy with WELL-SEPARATED per-e targets: if all
    # e-columns revert to (nearly) the same point, the Young lottery forms
    # a closed two-knot capture class per target and the chain is NOT
    # irreducible — the invariant distribution (hence its derivative) is
    # then non-unique and matrix-free vs dense conventions legitimately
    # disagree. Spreading the targets by several grid cells plus the
    # e-mixing makes the chain ergodic.
    policy = 0.5 * jnp.broadcast_to(grid[:, None], (n_a, n_e)) + 2.0 \
        + jnp.linspace(0.0, 3.0, n_e)[None, :] \
        + 0.3 * jnp.asarray(rng.uniform(size=(n_a, n_e)))
    return grid, Pi, policy


def test_matrix_free_matches_dense():
    grid, Pi, policy = _setup()

    def apply_fn(policies, D):
        return exog_apply(lottery_apply_multi(policies, D, [grid]), [Pi], 1)

    solve = make_invariant_solver(apply_fn, eps=1e-14)
    D0 = jnp.full(policy.shape, 1.0 / policy.size)
    D_mf = solve([policy], D0)

    lam = dense_full_transition(policy, grid, [Pi])
    D_dense = invariant_dist_colstoch(lam).reshape(policy.shape)

    assert float(jnp.max(jnp.abs(D_mf - D_dense))) < 1e-10
    assert abs(float(D_mf.sum()) - 1.0) < 1e-12


def test_matrix_free_jvp_matches_dense_jvp():
    grid, Pi, policy = _setup(seed=3)

    def apply_fn(policies, D):
        return exog_apply(lottery_apply_multi(policies, D, [grid]), [Pi], 1)

    solve = make_invariant_solver(apply_fn, eps=1e-14)
    D0 = jnp.full(policy.shape, 1.0 / policy.size)

    dpol = jnp.asarray(np.random.default_rng(4).normal(size=policy.shape)) * 0.01

    def f_mf(s):
        return solve([policy + s * dpol], D0)

    def f_dense(s):
        lam = dense_full_transition(policy + s * dpol, grid, [Pi])
        return invariant_dist_colstoch(lam).reshape(policy.shape)

    _, dD_mf = jax.jvp(f_mf, (0.0,), (1.0,))
    _, dD_dense = jax.jvp(f_dense, (0.0,), (1.0,))
    denom = float(jnp.max(jnp.abs(dD_dense))) + 1e-30
    assert float(jnp.max(jnp.abs(dD_mf - dD_dense))) / denom < 1e-6
    assert abs(float(dD_mf.sum())) < 1e-12
