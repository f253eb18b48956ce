"""Round-5 KS headline work: fused-sweep cost vs time-loop unroll + solve.

VERDICT r4 item 4: the KS fused sweep is serial-latency bound (47 µs/step
vs ~2 µs compute, BASELINE.md roofline); the kernel's `unroll` option
(HANK_TPU_UNROLL) amortizes per-step loop overhead but was never measured.
Run this once per unroll value (each U is a new Mosaic shape = one remote
AOT compile, then cached):

TPU: env PYTHONPATH=/root/repo:/root/.axon_site HANK_TPU_UNROLL=U \
    python scripts/r5_ks_speed.py [--no-solve]
"""
import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve


def med(fn, *a, n=7):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


ap = argparse.ArgumentParser()
ap.add_argument("--no-solve", action="store_true")
a = ap.parse_args()

T = 300
Tm1 = T - 1
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
v = jnp.full_like(x, 1e-3)
t = jnp.arange(1, T, dtype=jnp.float64)
exog = {"Z": 1.0 + 0.1 * 0.8 ** t}
interp = jax.default_backend() == "cpu"

out = {"unroll": int(os.environ.get("HANK_TPU_UNROLL", "1"))}
sweep = jax.jit(make_fused_jvp_dir(model, ss0, ssT, exog, interpret=interp))
t0 = time.perf_counter()
jax.block_until_ready(sweep(x, v))
out["sweep_compile_s"] = round(time.perf_counter() - t0, 1)
out["fused_sweep_ms"] = round(med(sweep, x, v) * 1e3, 2)

if not a.no_solve:
    exog_s = {"Z": exogenousZ(Tm1, rho=0.8, z_start=1.0, z_end=2.0)}
    solver = make_path_solver(Jbar, exog_s, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8)
    xs, info = solver(x)
    jax.block_until_ready(xs)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        xs, info = solver(x)
        jax.block_until_ready(xs)
        ts.append(time.perf_counter() - t0)
    out["solve_seconds_runs"] = [round(s, 3) for s in ts]
    out["solve_seconds"] = round(float(np.median(ts)), 3)
    out["solve_residual"] = float(info["residual_norm"])
print(json.dumps(out), flush=True)
