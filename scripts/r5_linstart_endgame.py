"""Endgame-only two-asset solve from the linear-IRF warm start (round 5).

The r5_linstart probe showed the warm start lands inside the region where
boehl's Richardson phase converges in 3 outers (52 sweeps, ~8 s) — but the
GMRES endgame contracts QUADRATICALLY from there (÷20..÷1000 per outer on
this model), so skipping Richardson entirely (max_outer=0) and running
host-PGMRES Newton from x_lin should replace those 52 sweeps with a few
F evals + matvecs. Measures the full production config both ways.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_linstart_endgame.py
"""
import json
import time

import jax.numpy as jnp
import numpy as np

from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.models import load_model
from hank_tpu.solvers.linear import linear_impulse_response
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

m2 = load_model("hank_two_asset", T=300)
s20, s2T, J2 = get_or_solve(m2)
ex2 = generate_exog_paths(m2, 299)

x_lin, _ = linear_impulse_response(J2, ex2, m2, s20, s2T,
                                   compute_residual=False)
np.asarray(x_lin)

for tag, mo in (("endgame_only", 0), ("default", None)):
    solver = make_path_solver(J2, ex2, m2, s20, s2T, method="boehl",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_inner=True, verbose=True, richardson_max_outer=mo)
    x, info = solver(x_lin)            # warm (programs are disk-cached)
    np.asarray(x)
    t0 = time.perf_counter()
    # include the warm-start build in the timed region: it is part of the
    # production cost of this route
    x_lin2, _ = linear_impulse_response(J2, ex2, m2, s20, s2T,
                                        compute_residual=False)
    x, info = solver(x_lin2)
    np.asarray(x)
    wall = time.perf_counter() - t0
    print(json.dumps({"config": f"hank2_T300_from_x_lin_{tag}",
                      "solve_s": round(wall, 3),
                      "residual": float(info["residual_norm"]),
                      "outers": int(info["iterations"]),
                      "prof": info.get("prof")}),
          flush=True)
