"""Two-asset HANK model functions (fiscal shock).

Household state: (liquid b, illiquid a, productivity e). The illiquid
account accumulates mechanically (pension-style): x = (1+ra)·a + s·inc(e),
a' = (1−λ)·x, payout λ·x into the liquid budget. The liquid choice is a
standard EGM with one twist: the continuation marginal value must be
evaluated at next period's (off-grid) illiquid position, so the Bellman step
interpolates the marginal-value array along the illiquid axis before the
expectation over e' — all vectorized gathers, scan/jit/AD-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hank_tpu.ops.egm import interp_columns


def fiscalShock(T: int, *, size: float = 0.02, rho: float = 0.8, **kwargs) -> jnp.ndarray:
    """Transitory government-spending path G_t = size · ρᵗ (tax-financed)."""
    t = jnp.arange(1, T + 1, dtype=jnp.float64)
    return size * rho ** t


def ValueFunction(value_next, xvals, model):
    """One EGM step over liquid bonds on the (b, a, e) state space.

      1. Illiquid mechanics: x = (1+ra)·a + s·inc(e); a' = (1−λ)x;
         payout λx joins liquid resources.
      2. Continuation: interpolate ∂V/∂b'(b', a, e') along the illiquid axis
         at a'(a, e), then take the e-expectation (Π matmul).
      3. Euler inversion, endogenous-grid interpolation onto the b grid,
         borrowing constraint, marginal value — as in the one-asset EGM.

    Returns {"Value": ∂V/∂b, "B": liquid policy, "A": illiquid policy,
    "C": consumption}.
    """
    liquid = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    income = model.heterogeneity["income"]
    bgrid, agrid = liquid.grid, illiq.grid
    Pi = income.transition
    n_b, n_a, n_e = liquid.n, illiq.n, income.n

    p = model.params
    beta, gamma = p["β"], p["γ"]
    s, lam = p["s"], p["lam"]
    r = xvals["r"]
    ra = xvals["ra"]
    tau = xvals["tau"]

    inc = jnp.maximum(1.0 - tau, 1e-9) * income.grid          # (n_e,)
    x_a = (1.0 + ra) * agrid[:, None] + s * inc[None, :]      # (n_a, n_e)
    a_next = (1.0 - lam) * x_a
    payout = lam * x_a
    liq_inc = (1.0 - s) * inc[None, :] + payout               # (n_a, n_e)

    # 2. Continuation marginal value at (b', a'(a,e), e'), then E over e'.
    #    value_next: (n_b, n_a, n_e'). The queries a_next[:, e] are shared
    #    across b and e', so ONE bracket search + TWO gathers along the
    #    illiquid axis cover the whole interpolation (no per-(e,e') loops —
    #    that formulation exploded compile time through jvp/vmap/while).
    idx = jnp.sum(agrid[None, None, :] < a_next[:, :, None], axis=-1)  # (n_a, n_e)
    idx = jnp.clip(idx, 1, n_a - 1)
    a_lo = agrid[idx - 1]
    a_hi = agrid[idx]
    t_w = jnp.clip((a_next - a_lo) / (a_hi - a_lo), 0.0, 1.0)          # (n_a, n_e)

    v_lo = jnp.take(value_next, idx - 1, axis=1)              # (n_b, n_a, n_e, n_e')
    v_hi = jnp.take(value_next, idx, axis=1)
    W = v_lo + t_w[None, :, :, None] * (v_hi - v_lo)          # V(b', a', e') per e
    EV = jnp.einsum("baef,ef->bae", W, Pi)                    # E_{e'|e}; (n_b, n_a, n_e)

    # 3. EGM over the liquid choice.
    expected = jnp.maximum(EV, 1e-12)
    cmat = (beta * expected) ** (-1.0 / gamma)                # at (b', a, e)
    bcol = bgrid[:, None, None]
    implied_b = (cmat + bcol - liq_inc[None, :, :]) / (1.0 + r)

    flat = lambda z: z.reshape(n_b, n_a * n_e)                # noqa: E731
    pol_b = interp_columns(bgrid, flat(implied_b),
                           jnp.broadcast_to(bcol, implied_b.shape).reshape(n_b, -1))
    pol_b = jnp.maximum(pol_b.reshape(n_b, n_a, n_e), p["borrow_cons"])

    c = jnp.maximum((1.0 + r) * bcol + liq_inc[None, :, :] - pol_b, 1e-12)
    value = (1.0 + r) * c ** (-gamma)

    pol_a = jnp.broadcast_to(a_next[None, :, :], (n_b, n_a, n_e))
    return {"Value": value, "B": pol_b, "A": pol_a, "C": c}
