"""Round-5 KS wall-clock: host-driven vs fully-traced newton_krylov outer.

The tunnel RTT is ~25.7 ms/dispatch (r5_rtt_probe.py); the host-driven
outer loop pays it per outer + per phase event. The fully-traced run
(host_outer=False: outer while_loop on device) pays ONE dispatch for the
whole solve. Compares both on the bench headline config (KS 200x7 T=300,
permanent Z 1->2, newton_krylov f32 directions + ds residuals).

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_ks_hostouter_probe.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

T = 300
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), T - 1)
exog = {"Z": exogenousZ(T - 1, rho=0.8, z_start=1.0, z_end=2.0)}

out = {}
for host in (True, False):
    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_outer=host)
    x, info = solver(x0)                    # compile + warm
    np.asarray(x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        x, info = solver(x0)
        np.asarray(x)                       # host fetch = true sync on axon
        ts.append(time.perf_counter() - t0)
    out[f"host_outer={host}"] = {
        "median_s": round(float(np.median(ts)), 3),
        "runs": [round(t, 3) for t in ts],
        "residual": float(info["residual_norm"]),
        "iters": int(info["iterations"])}
    print(json.dumps(out[f"host_outer={host}"]), flush=True)
print(json.dumps(out), flush=True)
