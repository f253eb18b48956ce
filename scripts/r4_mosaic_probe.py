"""Mosaic lowering-pattern probe for the two-asset fused kernel (round 4).

The two-asset sweep kernel (`ops/fused_sweep2.py`) leans on a handful of
Mosaic patterns the existing kernels do not exercise. Each probe is a tiny
standalone pallas_call; a pattern that fails to legalize fails HERE in a
~1-minute compile instead of inside a 10-25 min full-kernel compile. Run on
the real chip BEFORE building on any of these:

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_mosaic_probe.py

Patterns (name -> what the kernel uses it for):
  transpose_128      (128,128) jnp.transpose — L1<->L2 layout flips
  dot_nt             dot_general contracting lanes-with-lanes (A @ B^T) —
                     no-access fixed-query interp (W @ H^T)
  dot_tn             dot_general contracting sublanes-with-sublanes (A^T @ B)
                     — forward-lottery GEMM (HB^T @ U) and column->row moves
  outer_k1           (N,1) @ (1,N) K=1 matmul — MXU sublane-broadcast of a
                     traced row (the safe replacement for vector.broadcast)
  col_to_row         (128,1) -> (1,128) via dot_general TN against identity
  bcast_lead_sub     traced (1,1,K) -> (L,Q,K) broadcast — static-knot
                     interp against a row living in 3-D lanes
  sublane_1024       (1024,128) arrays + lane-reduce — flat-state forward
  scalar_vmem        ref[k, 0] static scalar read from a VMEM column
"""
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def run(name, kernel, out_shape, *args, interpret=False):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, f32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        out = jax.block_until_ready(jax.jit(fn)(*args))
        return name, "ok", float(np.asarray(out).sum())
    except Exception as e:  # noqa: BLE001 — report, don't crash the probe
        return name, "FAIL", str(e).split("\n")[0][:200]


def main(interpret=False):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(128, 128)), f32)
    B = jnp.asarray(rng.normal(size=(128, 128)), f32)
    col = jnp.asarray(rng.normal(size=(128, 1)), f32)
    row = jnp.asarray(rng.normal(size=(1, 128)), f32)
    big = jnp.asarray(rng.normal(size=(1024, 128)), f32)
    results = []

    def k_transpose(a_ref, o_ref):
        o_ref[:, :] = jnp.transpose(a_ref[:, :])

    results.append(run("transpose_128", k_transpose, (128, 128), A,
                       interpret=interpret))

    def k_nt(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    results.append(run("dot_nt", k_nt, (128, 128), A, B,
                       interpret=interpret))

    def k_tn(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    results.append(run("dot_tn", k_tn, (128, 128), A, B,
                       interpret=interpret))

    def k_outer(c_ref, r_ref, o_ref):
        o_ref[:, :] = jnp.dot(c_ref[:, :], r_ref[:, :],
                              preferred_element_type=f32)

    results.append(run("outer_k1", k_outer, (128, 128), col, row,
                       interpret=interpret))

    def k_c2r(c_ref, o_ref):
        eye = jnp.eye(128, dtype=f32)
        o_ref[:, :] = jax.lax.dot_general(
            c_ref[:, :], eye, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    results.append(run("col_to_row", k_c2r, (1, 128), col,
                       interpret=interpret))

    def k_bcast3(r_ref, o_ref):
        r3 = r_ref[:, :][None, :, :]                    # (1, 1, 128)
        full = jnp.broadcast_to(r3, (8, 16, 128))
        o_ref[:, :] = jnp.sum(full, axis=1)             # (8, 128)

    results.append(run("bcast_lead_sub", k_bcast3, (8, 128), row,
                       interpret=interpret))

    def k_1024(a_ref, o_ref):
        x = a_ref[:, :]
        o_ref[:, :] = jnp.sum(x * x, axis=1, keepdims=True)

    results.append(run("sublane_1024", k_1024, (1024, 1), big,
                       interpret=interpret))

    def k_scalar(c_ref, o_ref):
        s = c_ref[5, 0]
        o_ref[:, :] = jnp.full((8, 128), s, f32)

    results.append(run("scalar_vmem", k_scalar, (8, 128), col,
                       interpret=interpret))

    for name, status, detail in results:
        print(json.dumps({"pattern": name, "status": status,
                          "detail": detail}), flush=True)


if __name__ == "__main__":
    import sys

    main(interpret="--interpret" in sys.argv)
