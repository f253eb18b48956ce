"""Linear-IRF warm start for the production solves (round 5).

The linearized path (solvers/linear.py) costs one residual eval + one
J̄⁻¹ matvec and lands O(shock²) from the root — starting the Newton solve
there should remove early outers. Measures KS T=300 (traced newton_krylov,
from x_ss vs from x_lin) and two-asset T=300 (boehl host_inner, same
comparison), with host-fetch medians.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_linstart.py [ks|hank2]
"""
import json
import sys
import time

import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.solvers.linear import linear_impulse_response
from hank_tpu.solvers.newton import make_path_solver
from hank_tpu.utils.checkpoint import get_or_solve

which = sys.argv[1] if len(sys.argv) > 1 else "both"


def timed(solver, x0, n=3):
    x, info = solver(x0)
    np.asarray(x)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        x, info = solver(x0)
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), info


if which in ("ks", "both"):
    model = load_model("krusell_smith", T=300)
    ss0, ssT, Jbar = get_or_solve(model)
    endog = model.vars_of_type("endogenous")
    x_ss = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), 299)
    exog = {"Z": exogenousZ(299, rho=0.8, z_start=1.0, z_end=2.0)}
    solver = make_path_solver(Jbar, exog, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8,
                              host_outer=False, gmres_restart=10)
    t0 = time.perf_counter()
    x_lin, li = linear_impulse_response(Jbar, exog, model, ss0, ssT,
                                        compute_residual=False)
    np.asarray(x_lin)
    lin_s = time.perf_counter() - t0
    for tag, x0 in (("x_ss", x_ss), ("x_lin", x_lin)):
        med, info = timed(solver, x0)
        print(json.dumps({"config": f"ks_T300_from_{tag}",
                          "median_s": round(med, 3),
                          "lin_build_s": round(lin_s, 3),
                          "residual": float(info["residual_norm"]),
                          "iters": int(info["iterations"])}), flush=True)

if which in ("hank2", "both"):
    m2 = load_model("hank_two_asset", T=300)
    s20, s2T, J2 = get_or_solve(m2)
    ex2 = generate_exog_paths(m2, 299)
    e2 = m2.vars_of_type("endogenous")
    x_ss2 = jnp.tile(jnp.asarray([s2T.vars[k] for k in e2]), 299)
    solver2 = make_path_solver(J2, ex2, m2, s20, s2T, method="boehl",
                               direction_dtype=jnp.float32, eps=1e-8,
                               host_inner=True, verbose=True)
    t0 = time.perf_counter()
    x_lin2, li2 = linear_impulse_response(J2, ex2, m2, s20, s2T,
                                          compute_residual=False)
    np.asarray(x_lin2)
    lin2_s = time.perf_counter() - t0
    for tag, x0 in (("x_ss", x_ss2), ("x_lin", x_lin2)):
        x, info = solver2(x0)          # warm
        np.asarray(x)
        t0 = time.perf_counter()
        x, info = solver2(x0)
        np.asarray(x)
        dt = time.perf_counter() - t0
        print(json.dumps({"config": f"hank2_T300_from_{tag}",
                          "solve_s": round(dt, 3),
                          "lin_build_s": round(lin2_s, 3),
                          "residual": float(info["residual_norm"]),
                          "outers": int(info["iterations"]),
                          "prof": info.get("prof")}), flush=True)
