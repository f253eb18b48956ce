"""Dump pipeline stages at a fixed x for cross-backend diffing.

Saves (to --out):
- the residual vector F(x),
- every aggregate path from forward_iteration,
- the t=0..2 backward policies (full state-shaped arrays),
so the backend deviation seen in ||F_tpu(x*)|| can be attributed to a
stage and a state-space location.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/dump_pipeline_at_x.py --x /tmp/hank2_xstar.npy --out /tmp/stages_tpu.npz
CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python ... --out /tmp/stages_cpu.npz
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.blocks.backward import backward_iteration
from hank_tpu.blocks.forward import forward_iteration
from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

ap = argparse.ArgumentParser()
ap.add_argument("--x", default="/tmp/hank2_xstar.npy")
ap.add_argument("--out", required=True)
a = ap.parse_args()

model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, Jbar = get_or_solve(model)
x = jnp.asarray(np.load(a.x))

F = jax.jit(make_full_residual_fn(model, ss0, ssT, exog))
Fx = np.asarray(F(x))

bck = jax.jit(lambda z: backward_iteration(z, exog, model, ssT.vars, ssT.value))
pols = bck(x)
fwd = jax.jit(lambda p: forward_iteration(p, model, ss0.D))
aggs = fwd(pols)

out = {"F": Fx}
for k, v in aggs.items():
    out[f"agg_{k}"] = np.asarray(v)
for k, v in pols.items():
    out[f"pol0_{k}"] = np.asarray(v[:3])     # first three backward steps
    out[f"polmid_{k}"] = np.asarray(v[148:151])
np.save("/dev/null", np.zeros(1)) if False else None
np.savez_compressed(a.out, **out)
print("saved", a.out, "|F| =", float(np.linalg.norm(Fx)), flush=True)
