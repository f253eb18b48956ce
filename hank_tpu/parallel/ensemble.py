"""Ensemble solving: vmap whole shock ensembles, sharded across the mesh.

The TPU-native data parallelism the reference lacks (SURVEY §2.10 row "DP"):
each mesh device solves a shard of the shock-path ensemble; the solver's
while_loops run in lockstep under vmap (a batch element that has converged
keeps iterating harmlessly until all have).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hank_tpu.solvers.newton import make_full_residual_fn, newton_raphson_hank


def residual_ensemble(x_batch: jnp.ndarray,
                      exog_batch: Mapping[str, jnp.ndarray],
                      model, ss_initial, ss_ending,
                      mesh: Mesh | None = None) -> jnp.ndarray:
    """Batched F(x) over an ensemble of (x, shock-path) pairs.

    x_batch: (B, n_endog*(T-1)); exog_batch leaves: (B, T-1).
    With a mesh, inputs/outputs are sharded over the leading axis.
    """
    def F_one(x, exog):
        return make_full_residual_fn(model, ss_initial, ss_ending, exog)(x)

    fn = jax.vmap(F_one)
    if mesh is not None:
        shard = NamedSharding(mesh, P("dp"))
        fn = jax.jit(fn, in_shardings=(shard, {k: shard for k in exog_batch}),
                     out_shardings=shard)
    else:
        fn = jax.jit(fn)
    return fn(x_batch, exog_batch)


def solve_ensemble(x0: jnp.ndarray,
                   Jbar: jnp.ndarray,
                   exog_batch: Mapping[str, jnp.ndarray],
                   model, ss_initial, ss_ending,
                   mesh: Mesh | None = None,
                   method: str = "boehl",
                   **solver_kwargs) -> tuple[jnp.ndarray, dict]:
    """Solve the transition path for every shock in the ensemble.

    x0: (n,) shared initial guess (broadcast) or (B, n) per-path guesses.
    exog_batch leaves: (B, T-1). J̄ is shared (replicated) — the SS Jacobian
    does not depend on the shock path.

    Returns (x_paths (B, n), info dict of (B,) diagnostics).
    """
    def solve_one(x0_one, exog):
        # host_outer=False: the outer loop must be traced under vmap.
        return newton_raphson_hank(x0_one, Jbar, exog, model,
                                   ss_initial, ss_ending,
                                   method=method, host_outer=False,
                                   **solver_kwargs)

    B = next(iter(exog_batch.values())).shape[0]
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, x0.shape[0]))

    fn = jax.vmap(solve_one)
    if mesh is not None:
        # Everything batched is dp-sharded: the paths (B, n) and the info
        # diagnostics (each a (B,) leaf) alike; J̄ and the model close over
        # the function and are replicated by XLA.
        shard = NamedSharding(mesh, P("dp"))
        fn = jax.jit(fn,
                     in_shardings=(shard, {k: shard for k in exog_batch}),
                     out_shardings=(shard, shard))
    else:
        fn = jax.jit(fn)
    return fn(x0, exog_batch)
