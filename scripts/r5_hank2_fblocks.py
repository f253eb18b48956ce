"""Block-level cost split of the two-asset EXACT residual on TPU.

The host_inner solve spends ~65% of wall-clock in 8 exact-F evaluations
(~1.28 s each, round-5 prof). This times the three stages separately —
backward EGM scan, forward distribution push, assembly/equation tail —
to target the ds (double-single) residual kernel at the dominant stage.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_hank2_fblocks.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.blocks.assemble import assemble_full_xmat
from hank_tpu.blocks.assemble import residuals as eval_residuals
from hank_tpu.blocks.backward import backward_iteration
from hank_tpu.blocks.forward import forward_iteration
from hank_tpu.config import exact_lowerings
from hank_tpu.models import load_model
from hank_tpu.model.structures import generate_exog_paths
from hank_tpu.utils.checkpoint import get_or_solve


def t_pipe(fn, *args, n=3, pipeline=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(pipeline):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(ts))


model = load_model("hank_two_asset", T=300)
exog = generate_exog_paths(model, 299)
ss0, ssT, _ = get_or_solve(model)
Tm1 = model.compspec.T - 1
endog = model.vars_of_type("endogenous")
x0 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)


@jax.jit
def bwd(x):
    with exact_lowerings(True):
        return backward_iteration(x, exog, model, ssT.vars, ssT.value)


@jax.jit
def bwd_fwd(x):
    with exact_lowerings(True):
        pol = backward_iteration(x, exog, model, ssT.vars, ssT.value)
        return forward_iteration(pol, model, ss0.D)


@jax.jit
def full(x):
    with exact_lowerings(True):
        pol = backward_iteration(x, exog, model, ssT.vars, ssT.value)
        aggs = forward_iteration(pol, model, ss0.D)
        x_mat = assemble_full_xmat(x, aggs, exog, model, ss0.vars, ssT.vars)
        return eval_residuals(x_mat, model)


@jax.jit
def full_default(x):
    """Default lowerings (hat-GEMM interp/lottery). Post-erratum-fix these
    measured as accurate as the exact forms at the CPU root (4.50e-9 vs
    4.35e-9, BASELINE.md round 5) — if they are also FASTER, the host_inner
    control residual can run default with exact reserved for the final
    certification eval."""
    pol = backward_iteration(x, exog, model, ssT.vars, ssT.value)
    aggs = forward_iteration(pol, model, ss0.D)
    x_mat = assemble_full_xmat(x, aggs, exog, model, ss0.vars, ssT.vars)
    return eval_residuals(x_mat, model)


out = {}
for tag, fn in (("bwd", bwd), ("bwd_fwd", bwd_fwd), ("full", full),
                ("full_default", full_default)):
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(fn(x0))[0])
    out[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
    out[f"{tag}_ms"] = round(t_pipe(fn, x0) * 1e3, 1)
out["fwd_ms_est"] = round(out["bwd_fwd_ms"] - out["bwd_ms"], 1)
out["tail_ms_est"] = round(out["full_ms"] - out["bwd_fwd_ms"], 1)

# Accuracy cross-check: default vs exact residual at the SS guess and at a
# perturbed point (absolute agreement; both are ~1e-2-norm residuals here).
Fe = np.asarray(full(x0))
Fd = np.asarray(full_default(x0))
out["default_vs_exact_absdiff_x0"] = float(np.max(np.abs(Fe - Fd)))
xp = x0 * (1.0 + 1e-4)
out["default_vs_exact_absdiff_xp"] = float(np.max(np.abs(
    np.asarray(full(xp)) - np.asarray(full_default(xp)))))
print(json.dumps(out), flush=True)
