"""BASELINE config 5: batched shock-path ensembles (vmap over paths).

Measures the production mixed-precision primitive — batched f32 JVP sweeps
of the full equilibrium map over B distinct shock paths — at several batch
sizes, plus a full batched Boehl ensemble solve at a moderate B. Throughput
should grow ~linearly until the chip saturates.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_ensemble.py
"""

import json
import sys
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


def main():
    T = 300
    Tm1 = T - 1
    model = load_model("krusell_smith", T=T)
    ss0, ssT, Jbar = get_or_solve(model)
    endog = model.vars_of_type("endogenous")
    x32 = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]),
                   Tm1).astype(f32)
    v32 = jnp.full_like(x32, 1e-3)
    model32 = cast_model(model, f32)
    ss0_32, ssT_32 = cast_ss(ss0, f32), cast_ss(ssT, f32)
    t = jnp.arange(1, T, dtype=f32)

    def sweep_one(x, v, ex):
        F = make_full_residual_fn(model32, ss0_32, ssT_32, ex)
        return jax.jvp(F, (x,), (v,))[1]

    batched = jax.jit(jax.vmap(sweep_one, in_axes=(None, None, 0)))
    base = 1.0 / med(jax.jit(
        lambda x, v: sweep_one(x, v, {"Z": 1.0 + 0.1 * 0.8 ** t})), x32, v32)
    out = {"single_f32_sweeps_per_sec": round(base, 2)}
    for B in (64, 256, 1024):
        rhos = 0.5 + 0.4 * jnp.arange(B, dtype=f32) / B
        exog_b = {"Z": 1.0 + 0.1 * rhos[:, None] ** t[None, :]}
        bt = med(batched, x32, v32, exog_b)
        out[f"ensemble_B{B}_sweeps_per_sec"] = round(B / bt, 2)
        out[f"ensemble_B{B}_speedup_vs_single"] = round(B / bt / base, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
