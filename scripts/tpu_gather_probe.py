"""Probe Mosaic dynamic_gather support: in-vreg (128-lane) lane gathers.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_gather_probe.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

i32 = jnp.int32


def _take_lanes(a, idx):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(a, idx[..., None], dimension_numbers=dnums,
                          slice_sizes=(1, 1),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def probe(n_rows, n_lanes):
    def kernel(a_ref, idx_ref, out_ref):
        out_ref[:, :] = _take_lanes(a_ref[:, :], idx_ref[:, :])

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n_rows, n_lanes)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_lanes, size=(n_rows, n_lanes)).astype(np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, idx)
    ref = jnp.take_along_axis(a.astype(jnp.float64),
                              idx.astype(jnp.int64), axis=-1)
    err = float(jnp.max(jnp.abs(out - ref.astype(jnp.float32))))
    print(f"({n_rows}, {n_lanes}): max err {err}")


if __name__ == "__main__":
    for shape in [(8, 128), (16, 128), (8, 256)]:
        try:
            probe(*shape)
        except Exception as e:
            print(f"{shape}: FAILED — {str(e)[:200]}")
