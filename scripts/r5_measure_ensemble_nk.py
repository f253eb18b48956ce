"""Round-5 ensemble solve economics: batched lockstep Newton-Krylov.

VERDICT r4 item 3: the B=64 KS T=300 batched Richardson solve cost
442 s (6.9 s/path vs 0.69 s single-path) because lockstep Richardson
needed 1654 direction sweeps (worst path gates every step). The batched
newton_krylov (host-driven batched GMRES, parallel/ensemble.py round-5)
contracts in ~tens of lockstep sweeps. Target: per-path cost ≤ 2× the
single-path production solve.

Same workload as the round-3 record: B=64, KS 200×7 T=300, permanent
Z→2 shocks with per-path ρ ∈ [0.5, 0.9).

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_measure_ensemble_nk.py [B]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.models.krusell_smith import exogenousZ
from hank_tpu.parallel.ensemble import solve_ensemble_host
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
T = 300
Tm1 = T - 1
model = load_model("krusell_smith", T=T)
ss0, ssT, Jbar = get_or_solve(model)
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)

rhos = np.linspace(0.5, 0.9, B, endpoint=False)
Z = np.stack([np.asarray(exogenousZ(Tm1, rho=float(r), z_start=1.0,
                                    z_end=2.0)) for r in rhos])
exog_b = {"Z": jnp.asarray(Z)}

records = []
t0 = time.perf_counter()
x, info = solve_ensemble_host(x0, Jbar, exog_b, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8,
                              verbose=True, records=records)
np.asarray(x)
cold = time.perf_counter() - t0

t0 = time.perf_counter()
x, info = solve_ensemble_host(x0, Jbar, exog_b, model, ss0, ssT,
                              method="newton_krylov",
                              direction_dtype=jnp.float32, eps=1e-8)
np.asarray(x)
warm = time.perf_counter() - t0

res = np.asarray(info["residual_norm"])
# independent f64 recheck of the worst path
worst = int(res.argmax())
Fw = make_full_residual_fn(model, ss0, ssT,
                           {"Z": exog_b["Z"][worst]})
recheck = float(jnp.linalg.norm(jax.jit(Fw)(x[worst])))
print(json.dumps({
    "config": f"ensemble_nk_B{B}_ks_T300",
    "cold_seconds": round(cold, 1),
    "warm_seconds": round(warm, 1),
    "per_path_seconds": round(warm / B, 3),
    "max_residual": float(res.max()),
    "median_residual": float(np.median(res)),
    "outer_iters": int(info["iterations"]),
    "lockstep_sweeps": int(info["inner_iterations"]),
    "stalled_paths": int(info.get("stalled_paths", 0)),
    "worst_path_f64_recheck": recheck,
}), flush=True)
