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


def rayleigh_quotient(My: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """⟨y, M y⟩ / ⟨y, y⟩ given the precomputed product M y
    (`GeneralStructures.jl:559-561`; used for Boehl step-size adaptation)."""
    return jnp.dot(y, My) / jnp.dot(y, y)
