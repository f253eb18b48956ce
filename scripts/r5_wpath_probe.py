"""Round-5 forensics: per-step W-recursion deviation growth + forward-channel
isolation for the two-asset residual floor.

The CPU noise-injection calibration (`r5_noise_decompose.py`) proved that
ZERO-MEAN per-op noise at the measured op-error classes cannot produce the
6.2e-6 TPU floor (random signs cancel through the distribution/aggregation:
1.2e-10 W-noise -> only 6.8e-8). The round-4 stage dumps show the TPU policy
deviation is ONE-SIDED (mean ~ max/3) — a systematic BIAS that accumulates
linearly. This probe measures, on each backend at the CPU root x*:

1. the marginal-value path W_t for t = 0..T-2 (subsampled), so the
   CPU-vs-TPU deviation growth curve over the backward recursion separates
   per-step bias (linear growth) from terminal/input error (flat/decaying),
   per lowering mode (default hat-GEMM vs exact gather);
2. the full policy paths (f64), so the FORWARD block can be fed IDENTICAL
   policies on both backends (--forward-from), isolating the forward
   lottery/exog-mix channel from the backward one.

CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python scripts/r5_wpath_probe.py --out /tmp/r5_wpath_cpu.npz
TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r5_wpath_probe.py --out /tmp/r5_wpath_tpu.npz
    [--exact] [--forward-from /tmp/r5_wpath_cpu.npz]
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.blocks.backward import build_xvals_path
from hank_tpu.blocks.forward import forward_iteration
from hank_tpu.config import exact_lowerings
from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.utils.checkpoint import get_or_solve

ap = argparse.ArgumentParser()
ap.add_argument("--x", default="/tmp/hank2_xstar.npy")
ap.add_argument("--out", required=True)
ap.add_argument("--exact", action="store_true",
                help="trace under exact_lowerings")
ap.add_argument("--forward-from", default=None,
                help="npz with pol_{B,A,C} paths: run the forward block on "
                     "those FIXED policies and save the aggregate paths")
ap.add_argument("--every", type=int, default=10,
                help="subsample stride for the W path")
a = ap.parse_args()

model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, _ = get_or_solve(model)
x = jnp.asarray(np.load(a.x))
het_keys = model.vars_of_type("heterogeneous")
names = model.var_names()

out = {}

if a.forward_from:
    src = np.load(a.forward_from)
    pols = {k: jnp.asarray(src[f"pol_{k}"]) for k in het_keys}
    def fwd(p):
        with exact_lowerings(a.exact):
            return forward_iteration(p, model, ss0.D)
    aggs = jax.jit(fwd)(pols)
    for k, v in aggs.items():
        out[f"aggfix_{k}"] = np.asarray(v)
else:
    def backward_with_values(x_endog):
        with exact_lowerings(a.exact):
            xvals_path = build_xvals_path(x_endog, exog, model, ssT.vars)

            def step(value_next, xvals_row):
                xvals = {n: xvals_row[i] for i, n in enumerate(names)}
                result = model.value_fn(value_next, xvals, model)
                pols_t = tuple(result[k] for k in het_keys)
                return result["Value"], (result["Value"], pols_t)

            _, (values, policies) = jax.lax.scan(
                step, ssT.value, xvals_path, reverse=True)
            return values[::a.every], policies

    values, policies = jax.jit(backward_with_values)(x)
    out["values"] = np.asarray(values)
    out["every"] = np.asarray(a.every)
    for i, k in enumerate(het_keys):
        out[f"pol_{k}"] = np.asarray(policies[i])
    # Aggregates from the backend's own policies (default forward lowering
    # under the same exact flag as traced above).
    def fwd(p):
        with exact_lowerings(a.exact):
            return forward_iteration(p, model, ss0.D)
    aggs = jax.jit(fwd)({k: jnp.asarray(out[f"pol_{k}"]) for k in het_keys})
    for k, v in aggs.items():
        out[f"agg_{k}"] = np.asarray(v)

np.savez_compressed(a.out, **out)
print("saved", a.out, {k: np.shape(v) for k, v in out.items()}, flush=True)
