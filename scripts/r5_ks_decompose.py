"""Round-5 KS decompose with host-fetch timing (axon block_until_ready is
not a reliable sync — r5_rtt_probe.py): pipelined device costs of the ds
residual and fused sweep, plus traced-solve sensitivity to GMRES depth.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_ks_decompose.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.ops.fused_ds import make_ds_residual_fn
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve


def t_pipe(fn, *args, n=5, pipeline=8):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))


T = 300
Tm1 = T - 1
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
exog = {"Z": exogenousZ(Tm1, rho=0.8, z_start=1.0, z_end=2.0)}
v = jnp.full_like(x0, 1e-3)

out = {}
Rds = jax.jit(make_ds_residual_fn(model, ss0, ssT, exog))
out["ds_residual_ms"] = round(t_pipe(Rds, x0) * 1e3, 2)
sweep = jax.jit(make_fused_jvp_dir(model, ss0, ssT, exog))
out["fused_sweep_ms"] = round(t_pipe(sweep, x0, v) * 1e3, 2)
print(json.dumps(out), flush=True)

for gm, rs in ((2, 20), (1, 20), (2, 10), (1, 10), (3, 30)):
    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_outer=False,
                              gmres_maxiter=gm, gmres_restart=rs)
    x, info = solver(x0)
    np.asarray(x)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        x, info = solver(x0)
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    row = {"gmres_maxiter": gm, "restart": rs,
           "median_s": round(float(np.median(ts)), 3),
           "residual": float(info["residual_norm"]),
           "iters": int(info["iterations"])}
    print(json.dumps(row), flush=True)
