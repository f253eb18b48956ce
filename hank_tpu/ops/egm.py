"""Endogenous Grid Method primitives.

The reference's model value function interpolates the savings policy from the
endogenous grid back onto the exogenous wealth grid with Gridded(Linear) +
Flat extrapolation (`KrusellSmith.jl:65-72`). Here that is a vectorized
searchsorted+gather interpolation (`jnp.interp`), vmapped over the exogenous
state columns — fully differentiable w.r.t. query points, knots, and values,
and robust to arbitrary (even locally non-monotone) knots under jit, which the
reference flags as a startup hazard (`SteadyState.jl:129-132`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interp1d(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation with flat (constant) extrapolation.

    Equivalent to the reference's Gridded(Linear) + Flat() extrapolation
    (`KrusellSmith.jl:69-71`). `xp` must be (weakly) increasing.
    """
    return jnp.interp(x, xp, fp)


def interp_columns(x: jnp.ndarray, knots: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Column-wise interpolation over exogenous states.

    Args:
      x: (n_a,) or (n_a, n_exog) query points.
      knots: (n_a, n_exog) per-column knot vectors (endogenous grid).
      vals: (n_a,) or (n_a, n_exog) values at the knots.

    Returns (n_a, n_exog): for each column e, interp(x[:, e], knots[:, e], vals[:, e]).
    """
    n_exog = knots.shape[-1]
    if x.ndim == 1:
        x = jnp.broadcast_to(x[:, None], knots.shape)
    if vals.ndim == 1:
        vals = jnp.broadcast_to(vals[:, None], knots.shape)
    return jax.vmap(jnp.interp, in_axes=(1, 1, 1), out_axes=1)(x, knots, vals)


def egm_consumption(value_next: jnp.ndarray, Pi: jnp.ndarray,
                    beta: float, gamma: float) -> jnp.ndarray:
    """Euler-equation inversion: c = (β · E[∂V'/∂a' | e])^(-1/γ).

    `value_next` is (n_a, n_e); the expectation over next-period productivity
    is the MXU matmul `value_next @ Pi.T` (`KrusellSmith.jl:59`).
    """
    expected = value_next @ Pi.T
    return (beta * expected) ** (-1.0 / gamma)
