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


def interp_columns(x: jnp.ndarray, knots: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Column-wise interpolation over exogenous states.

    Args:
      x: (n_q,) or (n_q, n_exog) query points.
      knots: (n_k, n_exog) per-column knot vectors (endogenous grid).
      vals: (n_k,) or (n_k, n_exog) values at the knots.

    Returns (n_q, n_exog): for each column e, interp(x[:, e], knots[:, e],
    vals[:, e]) with flat extrapolation.

    TPU-lean lowering: bracket location is a vectorized comparison-sum (one
    compare + reduce, no binary-search loop), followed by two gathers and a
    clipped lerp — a handful of fused VPU ops per scan step instead of the
    many kernels `jnp.interp` emits. The clip gives zero gradient outside the
    knot range (flat extrapolation), matching the reference's Flat()
    extrapolation and clamped-boundary zero-derivative convention.
    """
    n_k, n_exog = knots.shape
    if x.ndim == 1:
        x = jnp.broadcast_to(x[:, None], (x.shape[0], n_exog))
    if vals.ndim == 1:
        vals = jnp.broadcast_to(vals[:, None], (vals.shape[0], n_exog))

    # idx[q, e] = #{k : knots[k, e] < x[q, e]}, clipped to a valid bracket.
    idx = jnp.sum(knots[None, :, :] < x[:, None, :], axis=1)
    idx = jnp.clip(idx, 1, n_k - 1)
    lo = jnp.take_along_axis(knots, idx - 1, axis=0)
    hi = jnp.take_along_axis(knots, idx, axis=0)
    v_lo = jnp.take_along_axis(vals, idx - 1, axis=0)
    v_hi = jnp.take_along_axis(vals, idx, axis=0)
    denom = hi - lo
    safe = jnp.where(denom > 0, denom, 1.0)      # guard duplicate knots
    t = jnp.clip((x - lo) / safe, 0.0, 1.0)
    return v_lo + t * (v_hi - v_lo)


def egm_consumption(value_next: jnp.ndarray, Pi: jnp.ndarray,
                    beta: float, gamma: float) -> jnp.ndarray:
    """Euler-equation inversion: c = (β · E[∂V'/∂a' | e])^(-1/γ).

    `value_next` is (n_a, n_e); the expectation over next-period productivity
    is the MXU matmul `value_next @ Pi.T` (`KrusellSmith.jl:59`).
    """
    expected = value_next @ Pi.T
    return (beta * expected) ** (-1.0 / gamma)
