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
