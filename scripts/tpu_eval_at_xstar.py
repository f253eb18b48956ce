"""Evaluate the TPU residual at the CPU-solved two-asset root x*.

Diagnoses whether the TPU full-precision residual is FAITHFUL at the true
root (||F_tpu(x*)|| ~ ||F_cpu(x*)|| < 1e-9) or carries backend-specific
deviation (e.g. bracket-flip discontinuities in the staged split) that
bounds any TPU solve's certifiable accuracy.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_eval_at_xstar.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, Jbar = get_or_solve(model)
F = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
F_exact = jax.jit(make_full_residual_fn(model, ss0, ssT, exog, exact=True))
out = {}
for tag, path in [("xstar", "/tmp/hank2_xstar.npy"),
                  ("floor", "/tmp/hank2_final_x.npy")]:
    try:
        x = jnp.asarray(np.load(path))
    except FileNotFoundError:
        continue
    Fx = np.asarray(F(x))
    out[f"F_tpu_at_{tag}"] = float(np.linalg.norm(Fx))
    out[f"F_tpu_at_{tag}_max"] = float(np.abs(Fx).max())
    Fe = np.asarray(F_exact(x))
    out[f"F_tpu_exact_at_{tag}"] = float(np.linalg.norm(Fe))
    out[f"F_tpu_exact_at_{tag}_max"] = float(np.abs(Fe).max())
try:
    xs = np.load("/tmp/hank2_xstar.npy"); xf = np.load("/tmp/hank2_final_x.npy")
    out["dist_floor_to_xstar_max"] = float(np.abs(xs - xf).max())
except FileNotFoundError:
    pass
print(json.dumps(out), flush=True)
