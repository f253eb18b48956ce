"""Precision utilities: dtype-cast views of models and steady states.

TPU v5e has no f64 hardware; XLA emulates f64 at 2.5-10x the f32 cost, and
the sequential scans are launch-bound either way. The solver therefore runs
**inexact Newton**: search directions come from an f32 copy of the pipeline
(fast), while residuals and the solution itself stay f64 (accurate) — the
standard mixed-precision Newton scheme, converging to full f64 accuracy with
only a mild rate penalty from the ~1e-7-relative direction error.

`cast_model` / `cast_ss` build the f32 views (jnp type promotion would
silently upcast any op touching an f64 constant, so every on-device constant
must be cast).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax.numpy as jnp


def cast_model(model, dtype):
    """Model copy with all on-device constants (grids, transitions) in `dtype`."""
    het = {}
    for name, dim in model.heterogeneity.items():
        het[name] = dataclasses.replace(
            dim,
            grid=dim.grid.astype(dtype),
            transition=None if dim.transition is None else dim.transition.astype(dtype))
    return dataclasses.replace(model, heterogeneity=het)


def cast_ss(ss, dtype):
    """SteadyState copy with arrays in `dtype`."""
    return dataclasses.replace(
        ss,
        vars={k: jnp.asarray(v, dtype=dtype) for k, v in ss.vars.items()},
        policies={k: v.astype(dtype) for k, v in ss.policies.items()},
        D=ss.D.astype(dtype),
        value=ss.value.astype(dtype))


def cast_paths(paths: Mapping[str, jnp.ndarray], dtype) -> dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v, dtype=dtype) for k, v in paths.items()}


def one_minus(x):
    """1 − x for traced f64 SCALARS — axon emulated-f64 erratum workaround.

    On the axon TPU backend, a jitted `literal − traced_scalar` subtract
    lowers through an f32 constant path and rounds at ~2e-8 RELATIVE (any
    literal; jnp.subtract and (1,)-shaped forms too), while `literal +
    (−x)`, `x − literal`, `x − y`, and all array-shaped subtracts are exact
    to ~1e-15 (measured: scripts/r5_scalar_sub_map.py, v5e 2026-08-20).
    This was THE residual-floor channel of the two-asset model: the
    per-period income scalar (1 − tau)·w deviated 4.4e-8 one-sidedly per
    Bellman step, compounding over the T-long backward recursion into the
    ~6e-6 cross-backend F(x*) deviation (BASELINE.md round-3/4
    post-mortems attributed it to contractions; the real source was this
    scalar). Use this for any literal-minus-traced-scalar in per-period
    price arithmetic. Semantically identical to `1.0 - x` everywhere.
    """
    return 1.0 + (-x)
