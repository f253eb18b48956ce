"""Pallas TPU kernels (experimental).

`forward_scan_pallas` fuses the ENTIRE distribution push-forward scan
(T-1 periods of Young lottery + Markov mixing + aggregation) into one kernel:
policies, the distribution carry, the grid and the Markov matrix all live in
VMEM for the whole recursion, eliminating per-step HBM round trips and kernel
launches.

Measured (v5e, KS 200×7, T=300, f32): 31 ms vs 36-39 ms for the XLA scan —
the sequential per-step floor, not launch overhead, dominates at this problem
size, so the fused kernel is kept experimental; the production scan path uses
the layout-tuned XLA ops (`ops/transition.py`), which also batch 12x better
under vmap. The kernel is the foundation for a future joint primal+tangent
(dual-number-in-VMEM) sweep kernel.

Mosaic constraints honored here (see pallas_guide): ≥2-D iota, int32
index math, no >2-D gathers (bracket endpoints via one-hot masked
reductions), no scalar VMEM stores (aggregates written as (1,1) slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_forward_scan_kernel(T: int, n_a: int, n_e: int):
    def kernel(grid_ref, pol_ref, d0_ref, pi_ref, agg_ref, dlast_ref):
        grid_row = grid_ref[0, :]                                   # (n_a,)

        def step(t, D):
            pol = pol_ref[t]                                        # (n_a, n_e)
            j = jnp.sum(grid_row[None, None, :] < pol[:, :, None],
                        axis=-1, dtype=jnp.int32)
            jc = jnp.maximum(jnp.minimum(j, jnp.int32(n_a - 1)), jnp.int32(1))

            # Bracket endpoints via masked reductions over the 'to' axis
            # (Mosaic supports only 2-D gathers).
            to_ids3 = jax.lax.broadcasted_iota(jnp.int32, (n_a, n_e, n_a), 2)
            lo_mask = (to_ids3 == (jc - 1)[:, :, None])
            hi_mask = (to_ids3 == jc[:, :, None])
            lo = jnp.sum(jnp.where(lo_mask, grid_row[None, None, :], 0.0), axis=2)
            hi = jnp.sum(jnp.where(hi_mask, grid_row[None, None, :], 0.0), axis=2)
            w = jnp.maximum(jnp.minimum((pol - lo) / (hi - lo),
                                        jnp.float32(1.0)), jnp.float32(0.0))

            # D_half[to, e] = Σ_a [lo_mask(1−w) + hi_mask·w] · D — pure VPU.
            Wmass = (lo_mask * (1.0 - w)[:, :, None] + hi_mask * w[:, :, None])
            D_half = jnp.sum(Wmass * D[:, :, None], axis=0).T       # (n_a_to, n_e)
            D_new = jnp.dot(D_half, pi_ref[:, :],
                            preferred_element_type=jnp.float32)
            agg_ref[pl.ds(t, 1), :] = jnp.sum(pol * D_new).reshape(1, 1)
            return D_new

        dlast_ref[:, :] = jax.lax.fori_loop(0, T, step, d0_ref[:, :])

    return kernel


def forward_scan_pallas(policies: jnp.ndarray, D0: jnp.ndarray,
                        grid: jnp.ndarray, Pi: jnp.ndarray,
                        interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused f32 distribution scan: returns (aggregates (T,), final D).

    `policies` (T, n_a, n_e); single endogenous + single exogenous dimension.
    Everything is cast to f32 (Pallas TPU has no f64).
    """
    f32 = jnp.float32
    policies = policies.astype(f32)
    T, n_a, n_e = policies.shape
    kernel = _make_forward_scan_kernel(T, n_a, n_e)
    agg, dlast = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((T, 1), f32),
                   jax.ShapeDtypeStruct((n_a, n_e), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(grid.astype(f32)[None, :], policies, D0.astype(f32), Pi.astype(f32))
    return agg[:, 0], dlast
