"""Round-4 ensemble measurement: batched Pallas kernels vs vmapped XLA.

Per-path sweep cost and a full B=64 batched Boehl solve through
`solve_ensemble_host(fused='auto')` (the batched kernel pair in
ops/fused_sweep_batch.py). Round-3 reference points: single-path solve
0.69 s; vmapped-XLA B=64 solve 442 s (6.9 s/path — 10x per-path overhead);
single fused sweep ~28 ms.

TPU: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_ensemble_fused.py
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hank_tpu.models import load_model
from hank_tpu.ops.fused_sweep import make_fused_jvp_dir
from hank_tpu.ops.fused_sweep_batch import make_fused_jvp_batch
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


def main(B=64, do_solve=True):
    T = 300
    Tm1 = T - 1
    interp = jax.default_backend() == "cpu"
    model = load_model("krusell_smith", T=T)
    ss0, ssT, Jbar = get_or_solve(model)
    endog = model.vars_of_type("endogenous")
    x = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
    v = jnp.full_like(x, 1e-3)
    t = jnp.arange(1, T, dtype=jnp.float64)
    rhos = 0.5 + 0.4 * jnp.arange(B, dtype=jnp.float64) / B
    exog_b = {"Z": 1.0 + 0.1 * rhos[:, None] ** t[None, :]}
    x_b = jnp.broadcast_to(x, (B, x.shape[0]))
    v_b = jnp.broadcast_to(v, (B, v.shape[0]))

    out = {"B": B}
    single = jax.jit(make_fused_jvp_dir(
        model, ss0, ssT, {"Z": exog_b["Z"][0]}, interpret=interp))
    t_single = med(single, x, v)
    out["single_fused_sweep_ms"] = round(t_single * 1e3, 2)

    jvp_batch = jax.jit(make_fused_jvp_batch(model, ss0, ssT,
                                             interpret=interp))
    t_batch = med(jvp_batch, x_b, v_b, exog_b)
    out["batch_fused_sweep_ms"] = round(t_batch * 1e3, 2)
    out["batch_fused_per_path_ms"] = round(t_batch / B * 1e3, 3)
    out["batch_fused_per_path_speedup"] = round(t_single / (t_batch / B), 1)
    print(json.dumps(out), flush=True)

    if do_solve:
        from hank_tpu.parallel.ensemble import solve_ensemble_host
        from hank_tpu.solvers.newton import make_full_residual_fn

        exog_s = {"Z": 2.0 + (1.0 - 2.0) * rhos[:, None] ** t[None, :]}
        F0 = make_full_residual_fn(model, ss0, ssT,
                                   {k: p[0] for k, p in exog_s.items()})
        fused_mode = "pallas" if interp else "auto"

        def run():
            return solve_ensemble_host(x, Jbar, exog_s, model, ss0, ssT,
                                       eps=1e-8, direction_dtype=f32,
                                       fused=fused_mode)

        xs, info = run()
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        xs, info = run()
        jax.block_until_ready(xs)
        solve_s = time.perf_counter() - t0
        out2 = {
            "fused_solve_B": B,
            "fused_solve_seconds": round(solve_s, 2),
            "fused_solve_per_path_s": round(solve_s / B, 3),
            "fused_solve_paths_per_sec": round(B / solve_s, 2),
            "fused_solve_max_residual": float(jnp.max(info["residual_norm"])),
            "fused_solve_path0_f64_residual": float(jnp.linalg.norm(F0(xs[0]))),
            "fused_solve_outer": int(info["iterations"]),
            "fused_solve_inner": int(info["inner_iterations"]),
        }
        print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--no-solve", action="store_true")
    a = ap.parse_args()
    main(B=a.B, do_solve=not a.no_solve)
