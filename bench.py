"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric: JVP sweeps/sec on the Krusell-Smith T=300 path — one sweep =
one forward-mode directional derivative of the full equilibrium map
F(x) = Residuals(assemble(x, Forward(Backward(x)))), the hot primitive of the
Boehl path solver (one per inner iteration, `NewtonRaphson.jl:95`; BASELINE.md
north-star metric).

vs_baseline: ratio against the CPU comparator measured with this same pipeline
on this container's CPU (Julia is not installed in this image; the reference
publishes no numbers — BASELINE.md). CPU_BASELINE_SWEEPS_PER_SEC below is that
measurement.

Extra fields (informational): full path-solve wall clock and batched-ensemble
throughput.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# Measured on this container's CPU (JAX CPU backend, KS 200x7, T=300).
CPU_BASELINE_SWEEPS_PER_SEC = 13.55        # f64 JVP sweeps/sec
CPU_BASELINE_SOLVE_SECONDS = 37.3          # best CPU full solve (boehl-mixed, warm)


def median_time(fn, *args, warmup=1, iters=5):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from hank_tpu.models import load_model
    from hank_tpu.solvers.newton import make_full_residual_fn
    from __graft_entry__ import _synthetic_ss

    T = 300
    model = load_model("krusell_smith", T=T)

    # Steady state: cached artifact if available, else a structurally valid
    # synthetic SS (JVP sweep cost is independent of the linearization point).
    ss = None
    try:
        from hank_tpu.utils.checkpoint import load_steady_state
        ss = load_steady_state(model, "initial")
    except Exception:
        ss = None
    if ss is None:
        ss = _synthetic_ss(model)

    Tm1 = T - 1
    t = jnp.arange(1, T, dtype=jnp.float64)
    exog = {"Z": 1.0 + 0.1 * 0.8 ** t}
    F = make_full_residual_fn(model, ss, ss, exog)
    endog = model.vars_of_type("endogenous")
    x0 = jnp.tile(jnp.asarray([ss.vars[k] for k in endog]), Tm1)
    y = jnp.full_like(x0, 1e-3)

    jvp_fn = jax.jit(lambda x, v: jax.jvp(F, (x,), (v,))[1])
    sweep_s = median_time(jvp_fn, x0, y)
    sweeps_per_sec = 1.0 / sweep_s

    extras = {}

    # Full path solve (north-star metric): permanent Z: 1 -> 2 transition,
    # mixed-precision Newton-Krylov, warm-timed. Requires a real cached
    # steady state (solve artifacts from utils.checkpoint); skipped on a
    # cold cache.
    try:
        from hank_tpu.utils.checkpoint import load_jacobian
        from hank_tpu.solvers.newton import make_path_solver
        from hank_tpu.models.krusell_smith import exogenousZ

        Jbar = load_jacobian(model)
        from hank_tpu.utils.checkpoint import load_steady_state
        ss0 = load_steady_state(model, "initial")
        ssT = load_steady_state(model, "ending")
        if Jbar is not None and ss0 is not None and ssT is not None:
            exog_t = {"Z": exogenousZ(Tm1, rho=0.8, z_start=1.0, z_end=2.0)}
            solver = make_path_solver(Jbar, exog_t, model, ss0, ssT,
                                      method="newton_krylov",
                                      direction_dtype=jnp.float32, eps=1e-8)
            x_ss = jnp.tile(jnp.asarray([ssT.vars[k] for k in endog]), Tm1)
            solver(x_ss)  # compile + warm
            t0 = time.perf_counter()
            x_sol, info = solver(x_ss)
            jax.block_until_ready(x_sol)
            extras["solve_T300_seconds"] = round(time.perf_counter() - t0, 3)
            extras["solve_T300_residual"] = float(info["residual_norm"])
    except Exception as e:  # pragma: no cover
        extras["solve_error"] = str(e)[:100]

    # Ensemble throughput (data-parallel axis; BASELINE config 5 shape,
    # smaller batch to keep bench time bounded).
    try:
        B = 64
        rhos = 0.5 + 0.4 * jnp.arange(B, dtype=jnp.float64) / B
        exog_b = {"Z": 1.0 + 0.1 * rhos[:, None] ** t[None, :]}

        def sweep_one(x, v, ex):
            Fb = make_full_residual_fn(model, ss, ss, ex)
            return jax.jvp(Fb, (x,), (v,))[1]

        batched = jax.jit(jax.vmap(sweep_one, in_axes=(None, None, 0)))
        bt = median_time(batched, x0, y, exog_b, warmup=1, iters=3)
        extras["ensemble_sweeps_per_sec"] = round(B / bt, 3)
    except Exception as e:  # pragma: no cover
        extras["ensemble_error"] = str(e)[:100]

    extras["jvp_sweeps_per_sec_f64"] = round(sweeps_per_sec, 3)
    extras["jvp_sweeps_vs_cpu"] = round(
        sweeps_per_sec / CPU_BASELINE_SWEEPS_PER_SEC, 3)

    if "solve_T300_seconds" in extras:
        # North-star metric (BASELINE.json): wall-clock to ||F|| < 1e-8 on the
        # T=300 permanent-shock path. vs_baseline > 1 means faster than the
        # CPU comparator.
        solve_s = extras.pop("solve_T300_seconds")
        result = {
            "metric": "ks_T300_solve_wall_clock",
            "value": solve_s,
            "unit": "s",
            "vs_baseline": round(CPU_BASELINE_SOLVE_SECONDS / solve_s, 3),
            **extras,
        }
    else:
        result = {
            "metric": "jvp_sweeps_per_sec_ks_T300",
            "value": round(sweeps_per_sec, 3),
            "unit": "sweeps/s",
            "vs_baseline": round(sweeps_per_sec / CPU_BASELINE_SWEEPS_PER_SEC, 3),
            **extras,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
