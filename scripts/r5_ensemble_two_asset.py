"""Two-asset ensemble sweeps (VERDICT r4 item 7; BASELINE config-5 axis).

BASELINE config 5 was KS-only. This measures vmapped f32 direction sweeps
of the FULL two-asset equilibrium map over B distinct fiscal-shock paths
(per-path size/persistence), the production mixed-precision primitive of
`solve_ensemble_host` — establishing the class is in ensemble scope on one
chip (the batched Pallas kernel pair stays KS-family; the two-asset sweep
is XLA, where the joint-lottery GEMM batches naturally).

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_ensemble_two_asset.py --B 16
CPU smoke: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python scripts/r5_ensemble_two_asset.py --B 2 --T 40
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.ops.precision import cast_model, cast_ss
from hank_tpu.solvers.newton import make_full_residual_fn
from hank_tpu.utils.checkpoint import get_or_solve

f32 = jnp.float32


def med(fn, *a, n=3):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(B=16, T=300):
    Tm1 = T - 1
    model = load_model("hank_two_asset", T=T)
    ss0, ssT, _ = get_or_solve(model)
    endog = model.vars_of_type("endogenous")
    x32 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1).astype(f32)
    v32 = jnp.full_like(x32, 1e-3)
    model32 = cast_model(model, f32)
    ss0_32, ssT_32 = cast_ss(ss0, f32), cast_ss(ssT, f32)
    t = jnp.arange(1, T, dtype=f32)
    sizes = 0.005 + 0.01 * jnp.arange(B, dtype=f32) / max(B - 1, 1)
    rhos = 0.5 + 0.4 * jnp.arange(B, dtype=f32) / B
    exog_b = {"G": sizes[:, None] * rhos[:, None] ** t[None, :]}

    def sweep_one(x, v, ex):
        F = make_full_residual_fn(model32, ss0_32, ssT_32, ex)
        return jax.jvp(F, (x,), (v,))[1]

    single = jax.jit(lambda x, v: sweep_one(
        x, v, {"G": exog_b["G"][0]}))
    t_single = med(single, x32, v32)
    batched = jax.jit(jax.vmap(sweep_one, in_axes=(None, None, 0)))
    t0 = time.perf_counter()
    jax.block_until_ready(batched(x32, v32, exog_b))
    compile_s = time.perf_counter() - t0
    t_batch = med(batched, x32, v32, exog_b)
    print(json.dumps({
        "config": f"hank2_T{T}_ensemble_sweeps",
        "B": B,
        "single_sweep_ms": round(t_single * 1e3, 1),
        "batch_sweep_ms": round(t_batch * 1e3, 1),
        "per_path_ms": round(t_batch / B * 1e3, 2),
        "per_path_speedup_vs_single": round(t_single / (t_batch / B), 2),
        "batch_compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--T", type=int, default=300)
    a = ap.parse_args()
    main(B=a.B, T=a.T)
