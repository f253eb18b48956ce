"""Validate + time the fused ds residual on the real TPU.

Compares F_ds (double-single Pallas kernel) against the emulated-f64
residual at KS 200x7 T=300 — both accuracy (the ds kernel must track the
emulated-f64 evaluation to ~1e-10 on perturbed and solved paths) and
wall-clock (the point: ds at ~f32 cost vs ~124 ms emulated f64).

Run: env PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/tpu_ds_check.py > /tmp/ds_tpu.log 2>&1 &
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.ops.fused_ds import make_ds_residual_fn, supports_ds_residual
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

T = 300
model = load_model("krusell_smith", T=T)
assert supports_ds_residual(model)
exog = {"Z": exogenousZ(T - 1, rho=0.8, z_start=1.0, z_end=2.0)}
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x_ss = jnp.tile(jnp.asarray([ss0.vars[k] for k in endog]), T - 1)

F64 = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
F_ds = jax.jit(make_ds_residual_fn(model, ss0, ssT, exog))

rng = np.random.default_rng(3)
x = x_ss + 0.01 * jnp.asarray(rng.normal(size=x_ss.shape))

t0 = time.perf_counter()
r64 = jax.block_until_ready(F64(x))
print(f"F64 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
rds = jax.block_until_ready(F_ds(x))
print(f"F_ds compile+run {time.perf_counter()-t0:.1f}s", flush=True)

err = float(jnp.max(jnp.abs(rds - r64)))
print(f"max|F_ds - F64| (perturbed path) = {err:.3e}", flush=True)

def timeit(f, x, n=20):
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

t64 = timeit(F64, x)
tds = timeit(F_ds, x)
print(json.dumps({"metric": "ds_residual", "err_vs_f64": err,
                  "t_f64_ms": round(t64 * 1e3, 2),
                  "t_ds_ms": round(tds * 1e3, 2),
                  "speedup": round(t64 / tds, 2)}), flush=True)
