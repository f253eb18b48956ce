"""Bisect which fused2 kernel fails Mosaic legalization on TPU.

Compiles the backward kernel (fused2_policies_jvp) and the forward kernel
(fused2_forward_jvp) SEPARATELY at full two-asset T=300 size with synthetic
inputs; each failure surfaces in ~10 s of remote compile instead of inside
the composed jvp_dir program.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fused2_bisect.py [bwd|fwd]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.ops.fused_sweep2 import fused2_forward_jvp, fused2_policies_jvp
from hank_tpu.ops.precision import cast_model, cast_ss
from hank_tpu.utils.checkpoint import get_or_solve

f32 = jnp.float32

which = sys.argv[1] if len(sys.argv) > 1 else "both"
model = load_model("hank_two_asset", T=300)
ss0, ssT, _ = get_or_solve(model)
model32 = cast_model(model, f32)
ssT32 = cast_ss(ssT, f32)
ss032 = cast_ss(ss0, f32)
Tm1 = model.compspec.T - 1
rng = np.random.default_rng(0)


def paths():
    base = {"r": ssT.vars["r"], "ra": ssT.vars["ra"], "w": ssT.vars["w"],
            "tau": ssT.vars["tau"]}
    ps = [jnp.full((Tm1,), float(base[k]), f32) for k in ("r", "ra", "w", "tau")]
    dps = [jnp.asarray(0.01 * rng.normal(size=(Tm1,)), f32) for _ in range(4)]
    return ps, dps


def _med(fn, *a, n=5):
    import time

    jax.block_until_ready(jax.tree.leaves(fn(*a)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(fn(*a)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


if which in ("bwd", "both"):
    ps, dps = paths()
    bwd_fn = jax.jit(lambda *args: fused2_policies_jvp(
        *args, ssT32.value, model32, interpret=False))
    pol, dpol = bwd_fn(*ps, *dps)
    jax.block_until_ready(pol["B"])
    print("bwd OK:", {k: float(jnp.abs(v).max()) for k, v in pol.items()},
          f"  {_med(bwd_fn, *ps, *dps):.1f} ms", flush=True)
else:
    liquid = model.heterogeneity["liquid"]
    illiq = model.heterogeneity["illiquid"]
    income = model.heterogeneity["income"]
    n_b, n_a, n_e = liquid.n, illiq.n, income.n
    shp = (Tm1, n_b, n_a, n_e, 2)
    pol = {k: jnp.asarray(rng.uniform(0.1, 1.0, size=shp), f32)
           for k in ("B", "A", "C")}
    dpol = {k: jnp.asarray(0.01 * rng.normal(size=shp), f32)
            for k in ("B", "A", "C")}

if which in ("fwd", "both"):
    fwd_fn = jax.jit(lambda p, dp: fused2_forward_jvp(
        p, dp, ss032.D, model32, interpret=False))
    aggs, daggs = fwd_fn(pol, dpol)
    jax.block_until_ready(aggs["B"])
    print("fwd OK:", {k: float(jnp.abs(v).max()) for k, v in aggs.items()},
          f"  {_med(fwd_fn, pol, dpol):.1f} ms", flush=True)
