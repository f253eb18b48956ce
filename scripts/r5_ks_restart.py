"""Fine sweep of the KS traced-solve GMRES restart depth.

r5_ks_decompose.py showed restart=10 (0.33 s) vs 20 (0.54 s) at identical
5-outer trajectories — jax.scipy's batched GMRES runs the full static
restart window per cycle, so the window size IS the sweep count. This
probes the floor: how shallow can the window go before the Newton
trajectory degrades?

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_ks_restart.py
"""
import json
import time

import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

T = 300
Tm1 = T - 1
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
exog = {"Z": exogenousZ(Tm1, rho=0.8, z_start=1.0, z_end=2.0)}

for rs in (4, 6, 8, 10):
    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_outer=False, gmres_restart=rs)
    x, info = solver(x0)
    np.asarray(x)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        x, info = solver(x0)
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"restart": rs,
                      "median_s": round(float(np.median(ts)), 3),
                      "runs": [round(t, 3) for t in ts],
                      "residual": float(info["residual_norm"]),
                      "iters": int(info["iterations"])}), flush=True)
