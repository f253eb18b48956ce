"""Large-grid Krusell-Smith model functions (BASELINE config 4).

Same household EGM step as the 200-point model; the shock generator is a
nonlinear ZLB-style productivity path: a deep drop clamped at a floor (the
constraint binds for the first several periods, giving the kinked path the
large asset grid is meant to resolve), then geometric recovery to the
steady state.
"""

from __future__ import annotations

import jax.numpy as jnp

from hank_tpu.models.krusell_smith import ValueFunction  # noqa: F401 — shared EGM step


def exogenousZ(T: int, *, drop: float = 0.30, rho: float = 0.90,
               floor: float = 0.88, z_ss: float = 1.0, **kwargs) -> jnp.ndarray:
    """ZLB-style kinked shock: Z_t = max(floor, z_ss − drop·ρᵗ).

    With the defaults the floor binds for ~9 periods (drop·ρᵗ > z_ss − floor),
    producing a non-smooth transition path — the nonlinearity stress test for
    the path solver (a linearized/fake-news solution cannot represent the
    kink; the Newton solver handles it exactly).
    """
    t = jnp.arange(1, T + 1, dtype=jnp.float64)
    return jnp.maximum(floor, z_ss - drop * rho ** t)
