"""Endgame GMRES-tolerance sweep on the two-asset T=300 production solve.

Each endgame Newton outer costs one ~1.3 s full-precision residual eval
(prof: F = 10.3 s of the 15.4 s certified solve), while an extra Arnoldi
matvec costs ~0.15 s — so a tighter inner solve that removes outers should
net several seconds. This sweeps endgame_gmres_tol and records wall-clock,
trajectory, and the per-program prof split for each setting. Floor: the
f32 direction operator's ~1e-6 relative matvec noise.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_endgame_tol.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, Jbar = get_or_solve(model)
Tm1 = model.compspec.T - 1
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)

for tol in (1e-3, 1e-4, 1e-5, 3e-6):
    records = []
    solver = make_path_solver(Jbar, exog, model, ss0, ssT, method="boehl",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_inner=True, records=records,
                              endgame_gmres_tol=tol)
    x, info = solver(x0)            # warm (programs cache across solvers)
    np.asarray(x)
    records.clear()
    t0 = time.perf_counter()
    x, info = solver(x0)
    np.asarray(x)
    dt = time.perf_counter() - t0
    print(json.dumps({"endgame_gmres_tol": tol,
                      "solve_seconds": round(dt, 3),
                      "residual": float(info["residual_norm"]),
                      "outer_iters": int(info["iterations"]),
                      "inner": int(info["inner_iterations"]),
                      "prof": info.get("prof"),
                      "records": records}), flush=True)
