"""Cost + deviation of the three two-asset residual programs on TPU.

Programs: the default f64 residual (hat-GEMM interp lowerings), the
exact-lowerings f64 residual (gather interps + elementwise expectation,
the host_inner certification program — measured 2.29 s/call, 69% of the
round-4 warm solve), and the f32 fused-direction residual
(`make_fused2_residual_fn`). Deviations are evaluated at the last solve
iterate (/tmp/hank2_final_x.npy) to size the residual-ladder design: the
cheap programs may steer descent control and line-search screening only
where their deviation from the exact program is small relative to ‖F‖.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_residual_costs.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.ops.fused_sweep2 import make_fused2_residual_fn
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve


def med(fn, *a, n=5):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, _ = get_or_solve(model)
F_hat = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
F_exact = jax.jit(make_full_residual_fn(model, ss0, ssT, exog, exact=True))
F_32 = jax.jit(make_fused2_residual_fn(model, ss0, ssT, exog,
                                       interpret=False))

x = jnp.asarray(np.load("/tmp/hank2_final_x.npy"))
out = {}
vals = {}
for tag, F in [("hat_f64", F_hat), ("exact_f64", F_exact),
               ("fused_f32", F_32)]:
    t0 = time.perf_counter()
    v = np.asarray(jax.block_until_ready(F(x)), dtype=np.float64)
    out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
    out[f"{tag}_ms"] = round(med(F, x) * 1e3, 1)
    out[f"{tag}_norm"] = float(np.linalg.norm(v))
    vals[tag] = v
out["dev_hat_vs_exact"] = float(
    np.linalg.norm(vals["hat_f64"] - vals["exact_f64"]))
out["dev_f32_vs_exact"] = float(
    np.linalg.norm(vals["fused_f32"] - vals["exact_f64"]))
print(json.dumps(out), flush=True)
