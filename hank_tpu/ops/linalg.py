"""Linear algebra for f64-accurate solves on TPU.

XLA:TPU only implements LU decomposition in f32 (`LuDecompositionExpander`
rejects f64), while the solver targets 1e-8 pointwise accuracy. The TPU-native
answer is mixed-precision **iterative refinement**: factor once in f32 on the
MXU, then recover full f64 accuracy with a few cheap f64 residual sweeps
(r = b - A x in emulated f64, correction solve in f32). For well-conditioned
systems (the reduced invariant-distribution matrix, the steady-state Jacobian
J̄) a handful of sweeps reaches ~1e-14 relative error.

All solves are wrapped in `lax.custom_linear_solve`, which supplies exact
implicit-function-theorem derivatives through both the right-hand side and the
matrix — the JAX-native equivalent of the reference's hand-derived
Dual-number IFT + Sherman-Morrison machinery (`ForwardIteration.jl:480-558`).

Capability map to the reference:
- `dense_solve` / `make_reusable_solver` ↔ `J \\ z`, `gmres!(·, J̄, ·)`
  (`SteadyState.jl:197`, `NewtonRaphson.jl:97-98`)
- `invariant_dist_colstoch` ↔ `invariant_dist` (`ForwardIteration.jl:436-442`)
- `rayleigh_quotient` ↔ `GeneralStructures.jl:559-561`
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from hank_tpu.config import config


def _refined_solver(A: jnp.ndarray):
    """Factor A in f32 once; return `solve(b, trans)` accurate to f64.

    `trans=0` solves A x = b, `trans=1` solves Aᵀ x = b (reusing the same
    factorization — needed for reverse-mode transpose solves).
    """
    out_dtype = A.dtype
    lu, piv = lu_factor(A.astype(jnp.float32))
    AT = A.T

    def solve(b: jnp.ndarray, trans: int = 0) -> jnp.ndarray:
        x0 = lu_solve((lu, piv), b.astype(jnp.float32), trans=trans).astype(out_dtype)
        if out_dtype == jnp.float32:
            return x0
        M = AT if trans else A

        def sweep(_, x):
            r = b - M @ x
            dx = lu_solve((lu, piv), r.astype(jnp.float32), trans=trans).astype(out_dtype)
            return x + dx

        return jax.lax.fori_loop(0, config.refine_iters, sweep, x0)

    return solve


def dense_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable f64-accurate dense solve of A x = b.

    Uses f32 LU + iterative refinement inside `lax.custom_linear_solve`, so
    forward/reverse derivatives w.r.t. both `A` and `b` come from implicit
    differentiation (tangent/cotangent systems reuse the same factorization).
    """
    solve = _refined_solver(A)
    matvec = lambda x: A @ x  # noqa: E731
    return jax.lax.custom_linear_solve(
        matvec, b,
        solve=lambda _, rhs: solve(rhs, 0),
        transpose_solve=lambda _, rhs: solve(rhs, 1))


def make_reusable_solver(A: jnp.ndarray) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Factor A once; return a cheap `solve(b)` for many right-hand sides.

    The path solver applies J̄⁻¹ twice per inner iteration
    (`NewtonRaphson.jl:97-98` does this with restarted GMRES against a sparse
    J̄); a reusable refined LU is both faster and more accurate on TPU.
    The returned closure is differentiable w.r.t. `b` only (A is treated as a
    constant preconditioner, which is exact for the Boehl iteration).
    """
    solve = _refined_solver(A)
    return lambda b: solve(b, 0)


def invariant_dist_colstoch(Lam: jnp.ndarray) -> jnp.ndarray:
    """Stationary distribution of a column-stochastic transition matrix.

    Solves (I − Λ) D = 0 with the normalization Σ D = 1 by replacing the last
    (redundant — columns of I − Λ sum to zero) balance equation with the
    normalization row. Unlike the reference's pin-the-first-state trick
    (`ForwardIteration.jl:436-442`), this stays nonsingular when the pinned
    state is *transient* (e.g. a coarse productivity grid where no household
    dissaves to the borrowing constraint), requiring only a unique recurrent
    class. Fully differentiable w.r.t. Λ via `dense_solve`'s implicit
    derivatives — replacing the reference's manual IFT + Sherman-Morrison
    Dual overload (`ForwardIteration.jl:480-558`).
    """
    n = Lam.shape[0]
    A = jnp.eye(n, dtype=Lam.dtype) - Lam
    A = A.at[-1, :].set(1.0)
    b = jnp.zeros((n,), Lam.dtype).at[-1].set(1.0)
    D = dense_solve(A, b)
    return D / jnp.sum(D)


def make_invariant_solver(apply_fn, *, eps: float = 1e-13,
                          max_iter: int = 200_000):
    """Matrix-free stationary distribution with implicit differentiation.

    `apply_fn(params, D) -> D'` is one period of the (column-stochastic)
    transition expressed as ops (lottery scatter/einsum + Markov matmuls) —
    the n_m × n_m matrix is never formed, so this scales to state spaces
    where the dense path (`invariant_dist_colstoch`) cannot (two-asset HANK:
    n_b·n_a·n_e ≳ 10⁴ states).

    Primal: Aitken-accelerated power iteration D ← apply(params, D).
    Tangent (custom_jvp): the IFT system dD = ∂_D apply·dD + ∂_p apply·dp
    with Σ dD = 0, solved by the same accelerated affine fixed point — the
    same mathematics as the reference's Dual-number Sherman-Morrison overload
    (`ForwardIteration.jl:480-558`) without any factorization.
    """

    def _accel_fixed_point(step, x0):
        def cond(carry):
            _, _, diff, it = carry
            return (diff > eps) & (it < max_iter)

        def body(carry):
            x, diff_prev, _, it = carry
            x_new = step(x)
            diff = jnp.max(jnp.abs(x_new - x))
            lam = jnp.clip(diff / jnp.maximum(diff_prev, 1e-300), 0.0, 0.995)
            do_ex = (it % 20 == 19) & (it > 40)
            x_next = jnp.where(do_ex, x_new + (x_new - x) * (lam / (1 - lam)),
                               x_new)
            return x_next, diff, diff, it + 1

        x, _, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.inf, jnp.inf, 0))
        return x

    @jax.custom_jvp
    def solve(params, D0):
        D = _accel_fixed_point(lambda d: apply_fn(params, d), D0)
        return D / jnp.sum(D)

    @solve.defjvp
    def solve_jvp(primals, tangents):
        (params, D0), (dparams, _) = primals, tangents
        D_star = solve(params, D0)

        def tan_step_proj(dD):
            dD_new = jax.jvp(apply_fn, (params, D_star), (dparams, dD))[1]
            # project onto the sum-zero subspace (differentiated normalization)
            return dD_new - jnp.sum(dD_new) / dD_new.size

        dD_star = _accel_fixed_point(tan_step_proj, jnp.zeros_like(D_star))
        dD_star = dD_star - jnp.sum(dD_star) / dD_star.size
        return D_star, dD_star

    return solve


def rayleigh_quotient(My: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """⟨y, M y⟩ / ⟨y, y⟩ given the precomputed product M y
    (`GeneralStructures.jl:559-561`; drives Boehl step-size adaptation in
    `solvers/newton.py`). Guarded against y = 0 (first inner iteration)."""
    return jnp.dot(y, My) / jnp.maximum(jnp.dot(y, y), 1e-300)
