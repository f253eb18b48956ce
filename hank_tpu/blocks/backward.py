"""Household backward block: EGM policy recursion along the transition path.

Capability parity with the reference's `BackwardIteration.jl:46-116`. The
reference's Julia `for t = T-1 ... 1` loop over `model.value_fn` becomes a
reversed `jax.lax.scan` over a pure Bellman step — the whole recursion stays
on-device and is natively forward- and reverse-differentiable (no hand-written
rrules needed).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def build_xvals_path(
    x_endog: jnp.ndarray,
    exog_paths: Mapping[str, jnp.ndarray],
    model,
    ss_end_vars: Mapping[str, jnp.ndarray],
) -> jnp.ndarray:
    """Assemble the (T-1, n_v) per-period aggregate values consumed by value_fn.

    Endogenous rows come from the flat search vector; exogenous rows from the
    shock paths; heterogeneous rows are filled with ending-SS values (the
    value function ignores them but the signature requires concrete values —
    `BackwardIteration.jl:66-82`).
    """
    cs = model.compspec
    Tm1 = cs.T - 1
    names = model.var_names()

    cols = []
    x_by_period = x_endog.reshape(Tm1, cs.n_endog)
    endog_names = model.vars_of_type("endogenous")
    for name in names:
        var = model.variables[name]
        if var.var_type == "endogenous":
            cols.append(x_by_period[:, endog_names.index(name)])
        elif var.var_type == "exogenous":
            cols.append(jnp.asarray(exog_paths[name]))
        else:  # heterogeneous — ending-SS fill
            cols.append(jnp.broadcast_to(
                jnp.asarray(ss_end_vars[name], dtype=x_endog.dtype), (Tm1,)))
    return jnp.stack(cols, axis=1)


def backward_iteration(
    x_endog: jnp.ndarray,
    exog_paths: Mapping[str, jnp.ndarray],
    model,
    ss_end_vars: Mapping[str, jnp.ndarray],
    terminal_value: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    """Backward EGM recursion over the T-1 transition periods.

    Starting from the terminal marginal value (ending steady state,
    `BackwardIteration.jl:84-85`), scans `model.value_fn` backward in time and
    stacks each heterogeneous variable's policy path.

    Returns: dict mapping each heterogeneous variable name to a
    (T-1, *state_shape) array — policies[v][t] is the period-(t+1) policy.
    """
    het_keys = model.vars_of_type("heterogeneous")
    names = model.var_names()
    xvals_path = build_xvals_path(x_endog, exog_paths, model, ss_end_vars)

    def step(value_next, xvals_row):
        xvals = {name: xvals_row[i] for i, name in enumerate(names)}
        result = model.value_fn(value_next, xvals, model)
        policies_t = tuple(result[k] for k in het_keys)
        return result["Value"], policies_t

    # Reverse-time scan: iterate t = T-1 ... 1, outputs returned in forward
    # time order (scan with reverse=True stacks along the original axis).
    _, policies = jax.lax.scan(step, terminal_value, xvals_path, reverse=True)
    return {k: policies[i] for i, k in enumerate(het_keys)}
